"""owlexabrick-tpu: a TPU-native (JAX/XLA/Pallas) framework for interactive
ray tracing of structured AMR volume data using the "exa bricks" data model.

This is a from-scratch, TPU-first re-design with the capabilities of the
CUDA/OptiX reference (owl-project/owlExaBrick): the same file formats
(.cells/.scalars/.bricks/.tris/.exa), the same data model (bricks of
2^level-wide cells, basis-function "same-bricks regions"), and the same
renderer feature set (DVR, iso surfaces, contour planes, triangle meshes,
streamline tracing, AO, progressive accumulation) — but built on SoA jnp
arrays, a stackless BSP point-location tree instead of an RTX BVH, masked
wavefront ray marching under jit, and jax.sharding over a device mesh
instead of multi-GPU buffer replication.
"""

__version__ = "0.1.0"

from .core.types import (
    Bricks,
    Regions,
    RegionTree,
    Scene,
)
