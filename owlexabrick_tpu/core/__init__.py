from .types import Bricks, Regions, RegionTree, Scene, ScalarField, TriangleMesh
from . import constants
