"""Core data model: bricks, regions, the region BSP tree, and the scene.

Everything is structure-of-arrays so it maps directly onto device memory:
the renderer consumes flat jnp arrays, never python objects.  Host-side
preprocessing (builder, region build) produces the same arrays as numpy.

Data model (matching the reference semantics, re-designed SoA):
  * A *brick* is a regular grid of ``size`` cells with cell width
    ``2**level``, anchored at integer position ``lower`` (reference:
    exa/ExaBricks.h:26-60, programs/Brick.h:31-71).
  * ``bounds``  = [lower, lower + size * 2^level]
  * ``domain``  = bounds padded by 0.5 * 2^level on each side — the support
    of the brick's tent basis functions.
  * A *region* is an axis-aligned box in which a fixed set of brick basis
    functions overlap; regions tile the union of all brick domains without
    overlapping (reference: exa/Regions.h:28-66).
  * The *region tree* is the BSP recorded while building regions: inner
    nodes carry (axis, split-plane), leaves carry a region id (or -1 for a
    spatial hole).  Point location is a fixed-depth stackless descent —
    this replaces the reference's OptiX BVH as the traversal structure and
    is the key TPU-first design choice: every ray performs the same number
    of loop iterations, with divergence only in the gathered node data.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Tuple

import numpy as np

Array = Any  # np.ndarray or jnp.ndarray


def _pytree_dataclass(cls=None, *, meta=()):
    """Register a dataclass as a JAX pytree with `meta` fields static."""

    def wrap(c):
        c = dataclass(c)
        import jax

        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in meta]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta)
        )
        return c

    return wrap(cls) if cls is not None else wrap


@_pytree_dataclass
class Bricks:
    """SoA brick table plus the flattened per-brick cell scalar layout.

    ``begin[i]`` is the offset of brick i's cells in the flattened cell
    array (cells are laid out x-fastest, reference programs/Brick.h:61-64).
    """

    lower: Array  # (M, 3) int32 — integer anchor in voxel space
    size: Array  # (M, 3) int32 — number of cells per axis
    level: Array  # (M,)  int32 — cell width = 2**level
    begin: Array  # (M,)  int32 — offset into flattened cell arrays

    @property
    def num_bricks(self) -> int:
        return int(self.lower.shape[0])

    @property
    def cell_width(self) -> Array:
        return 2 ** self.level.astype(np.int64)

    def bounds(self) -> Tuple[Array, Array]:
        """Per-brick [lower, upper) world bounds (float)."""
        cw = (1 << self.level.astype(np.int64)).astype(np.float32)
        lo = self.lower.astype(np.float32)
        hi = lo + self.size.astype(np.float32) * cw[:, None]
        return lo, hi

    def domains(self) -> Tuple[Array, Array]:
        """Per-brick basis-function support: bounds padded by 0.5*cellwidth."""
        cw = (1 << self.level.astype(np.int64)).astype(np.float32)
        lo = self.lower.astype(np.float32) - 0.5 * cw[:, None]
        hi = (
            self.lower.astype(np.float32)
            + (self.size.astype(np.float32) + 0.5) * cw[:, None]
        )
        return lo, hi


@_pytree_dataclass
class Regions:
    """Same-bricks regions: non-overlapping boxes + per-region brick lists.

    ``brick_ids`` is the leaf list padded to a fixed K = max bricks/region
    with -1, so the sampling loop is a fixed-size K iteration (a TPU-first
    replacement for the reference's variable-length leafList walk,
    exa/Regions.h:31-41).  ``leaf_list`` keeps the exact packed lists for
    tools/tests.
    """

    domain_lo: Array  # (N, 3) float32
    domain_hi: Array  # (N, 3) float32
    value_range: Array  # (N, C) x 2 -> (N, 2) float32 over all channels
    finest_cw: Array  # (N,) float32 — finest (smallest) cell width in region
    brick_ids: Array  # (N, K) int32, padded with -1
    leaf_list: Array  # (L,) int32 packed lists
    leaf_begin: Array  # (N,) int32
    leaf_size: Array  # (N,) int32

    @property
    def num_regions(self) -> int:
        return int(self.domain_lo.shape[0])

    @property
    def max_bricks_per_region(self) -> int:
        return int(self.brick_ids.shape[1])


@_pytree_dataclass(meta=("depth",))
class RegionTree:
    """Stackless BSP point-location tree over regions.

    Node layout (SoA):
      * ``axis[i]``  in {0,1,2} for inner nodes, 3 for leaves
      * ``split[i]`` split plane position (inner only)
      * ``child[i]`` index of left child; right child = child+1 (inner only)
      * ``leaf[i]``  region id, or -1 for an empty leaf (holes in the AMR)

    ``depth`` bounds the descent length; locating the leaf containing a
    point is exactly ``depth`` dependent gathers — branch-free and
    identical for every ray in a batch.
    """

    axis: Array  # (T,) int32
    split: Array  # (T,) float32
    child: Array  # (T,) int32
    leaf: Array  # (T,) int32
    node_lo: Array  # (T, 3) float32 — node domain (used at leaves: the box
    node_hi: Array  # (T, 3) float32 —   a ray must skip past, holes included)
    depth: int = 0


@_pytree_dataclass(meta=("num_channels", "max_bricks_per_region", "tree_depth"))
class Scene:
    """Device-ready scene: everything the render kernels consume.

    The analog of the reference's LaunchParams buffers
    (programs/LaunchParams.h:26-80), flattened to SoA jnp arrays.
    """

    # bricks
    brick_lower: Array  # (M, 3) float32 (voxel space)
    brick_size: Array  # (M, 3) int32
    brick_cell_width: Array  # (M,) float32 = 2**level
    brick_begin: Array  # (M,) int32

    # per-channel cell scalars, gathered through cellIDs: shape (C, total_cells)
    scalars: Array

    # regions
    region_lo: Array  # (N, 3) float32
    region_hi: Array  # (N, 3) float32
    region_value_range: Array  # (N, 2) float32
    region_finest_cw: Array  # (N,) float32
    region_bricks: Array  # (N, K) int32 padded with -1

    # BSP tree
    tree_axis: Array  # (T,) int32
    tree_split: Array  # (T,) float32
    tree_child: Array  # (T,) int32
    tree_leaf: Array  # (T,) int32
    tree_lo: Array  # (T, 3) float32
    tree_hi: Array  # (T, 3) float32

    # bounds
    voxel_bounds_lo: Array  # (3,) float32 — union of brick bounds
    voxel_bounds_hi: Array  # (3,) float32
    world_bounds_lo: Array  # (3,) float32 — voxel bounds through inverse remap
    world_bounds_hi: Array  # (3,) float32

    # world -> voxel affine transform (row-major 3x4: [A | b], p_v = A p_w + b)
    voxel_from_world: Array  # (3, 4) float32

    # static metadata
    num_channels: int = 1
    max_bricks_per_region: int = 1
    tree_depth: int = 1


@dataclass
class ScalarField:
    """A named per-cell scalar field (host side).

    ``values[i]`` is the value of input cell i (the .cells file ordering);
    the renderer gathers these through brick cellIDs into the flattened
    brick layout. Mirrors exa/ScalarField.h:24-44.
    """

    name: str
    values: np.ndarray  # (num_input_cells,) float32
    value_range: Tuple[float, float] = (0.0, 0.0)

    @staticmethod
    def from_values(name: str, values: np.ndarray) -> "ScalarField":
        values = np.asarray(values, dtype=np.float32)
        if values.size:
            rng = (float(values.min()), float(values.max()))
        else:
            rng = (np.inf, -np.inf)
        return ScalarField(name=name, values=values, value_range=rng)


@dataclass
class TriangleMesh:
    """A triangle surface mesh (exa/TriangleMesh.h:23-38)."""

    vertices: np.ndarray  # (V, 3) float32
    indices: np.ndarray  # (T, 3) int32
