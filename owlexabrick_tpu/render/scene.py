"""Scene assembly: turn loaded config/bricks/fields into device-ready SoA
arrays (the analog of OptixRenderer's buffer setup, exa/OptixRenderer.cpp:38-210).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.constants import EMPTY_CELL_POISON_VALUE
from ..core.types import Bricks, Regions, RegionTree, ScalarField, Scene
from ..io.config import Config
from ..regions.build import build_regions


def to_device(scene: Scene) -> Scene:
    """Move every scene array onto the default device as jnp arrays."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, scene)


def build_brick_regions(bricks: Bricks, scalars: np.ndarray,
                        num_channels: int = 1):
    """Non-basis traversal structure: a BSP over brick *bounds*.

    Brick bounds tile space without overlap, so each BSP leaf holds
    exactly one brick; per-leaf value ranges cover only that brick's
    cells and ``finest_cw`` is the brick's own cell width — the structure
    the reference's EXPLICIT_BASIS_METHOD=OFF BVH provides
    (programs/exabrick.cu:226-330)."""
    import dataclasses as _dc

    # reuse the BSP machinery with brick *bounds* standing in as domains
    from ..regions.build import build_regions_py

    bb = Bricks(
        lower=bricks.lower, size=bricks.size, level=bricks.level,
        begin=bricks.begin,
    )
    bb.domains = bb.bounds  # type: ignore[method-assign]
    regions, tree = build_regions_py(bb, scalars, num_channels=num_channels)
    # per-brick ranges and the brick's own cell width
    cw = (1 << bricks.level.astype(np.int64)).astype(np.float32)
    fin = np.where(
        regions.brick_ids[:, 0] >= 0,
        cw[np.clip(regions.brick_ids[:, 0], 0, None)],
        regions.finest_cw,
    ).astype(np.float32)
    regions = _dc.replace(regions, finest_cw=fin)
    return regions, tree


def gather_scalars(
    cell_ids: np.ndarray, fields: Sequence[ScalarField]
) -> np.ndarray:
    """Gather per-input-cell field values through the brick cellID
    indirection into the flattened per-brick layout -> (C, total_cells).

    Mirrors exa/OptixRenderer.cpp:103-143 (one concatenated scalar buffer,
    one offset per channel — here axis 0 is the channel).
    """
    cell_ids = np.asarray(cell_ids, np.int64)
    if cell_ids.size and cell_ids.min() < -1:
        raise ValueError("negative cell ID")
    # -1 is the ALLOW_EMPTY_CELLS empty-cell sentinel
    # (exa/ExaBricks.cpp:46): its scalar is the poison value, which the
    # basis sum skips when the flag is on (exabrick.cu:614-618)
    empty = cell_ids < 0
    ids = np.where(empty, 0, cell_ids)
    out = np.zeros((len(fields), cell_ids.size), np.float32)
    for c, f in enumerate(fields):
        if cell_ids.size and cell_ids.max() >= f.values.size:
            raise ValueError(f"invalid cell ID for field '{f.name}'")
        out[c] = np.where(empty, np.float32(EMPTY_CELL_POISON_VALUE),
                          f.values[ids])
    return out


def build_scene(
    bricks: Bricks,
    cell_ids: np.ndarray,
    fields: Sequence[ScalarField],
    voxel_from_world: Optional[np.ndarray] = None,
    num_range_channels: Optional[int] = None,
    basis_method: bool = True,
) -> Tuple[Scene, Regions, RegionTree]:
    """Build the full device scene.

    ``num_range_channels``: how many channels participate in region value
    ranges (the reference uses all channels in multi-field DVR mode, else
    just channel 0, OptixRenderer.cpp:151-157).

    ``basis_method=False`` builds the reference's non-basis mode
    (EXPLICIT_BASIS_METHOD=OFF): traversal over brick *bounds* instead of
    basis domains (each leaf holds exactly one brick), nearest-cell
    sampling, per-brick value ranges (OptixRenderer.cpp:176-202).
    """
    scalars = gather_scalars(cell_ids, fields)
    if basis_method:
        regions, tree = build_regions(
            bricks, scalars, num_channels=num_range_channels
        )
    else:
        regions, tree = build_brick_regions(
            bricks, scalars, num_channels=1
        )

    b_lo, b_hi = bricks.bounds()
    v_lo = b_lo.min(axis=0)
    v_hi = b_hi.max(axis=0)

    if voxel_from_world is None:
        voxel_from_world = np.zeros((3, 4), np.float32)
        voxel_from_world[:, :3] = np.eye(3)
    m = np.asarray(voxel_from_world, np.float64)
    inv_a = np.linalg.inv(m[:, :3])
    w_lo = inv_a @ (v_lo - m[:, 3])
    w_hi = inv_a @ (v_hi - m[:, 3])

    scene = Scene(
        brick_lower=bricks.lower.astype(np.float32),
        brick_size=bricks.size.astype(np.int32),
        brick_cell_width=(1 << bricks.level.astype(np.int64)).astype(np.float32),
        brick_begin=bricks.begin.astype(np.int32),
        scalars=scalars,
        region_lo=regions.domain_lo,
        region_hi=regions.domain_hi,
        region_value_range=regions.value_range,
        region_finest_cw=regions.finest_cw,
        region_bricks=regions.brick_ids,
        tree_axis=tree.axis,
        tree_split=tree.split,
        tree_child=tree.child,
        tree_leaf=tree.leaf,
        tree_lo=tree.node_lo,
        tree_hi=tree.node_hi,
        voxel_bounds_lo=v_lo.astype(np.float32),
        voxel_bounds_hi=v_hi.astype(np.float32),
        world_bounds_lo=w_lo.astype(np.float32),
        world_bounds_hi=w_hi.astype(np.float32),
        voxel_from_world=np.asarray(voxel_from_world, np.float32),
        num_channels=len(fields),
        max_bricks_per_region=regions.max_bricks_per_region,
        tree_depth=tree.depth,
    )
    return scene, regions, tree


def scene_from_config(
    cfg: Config, multi_field_dvr: bool = False
) -> Tuple[Scene, Regions, RegionTree]:
    if cfg.bricks is None:
        raise ValueError("config has no bricks")
    n_range = len(cfg.scalar_fields) if multi_field_dvr else 1
    return build_scene(
        cfg.bricks,
        cfg.cell_ids,
        cfg.scalar_fields,
        voxel_from_world=cfg.voxel_from_world(),
        num_range_channels=n_range,
    )
