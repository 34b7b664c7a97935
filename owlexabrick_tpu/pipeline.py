"""End-to-end convenience pipeline: cells -> bricks -> regions -> scene.

Chains the offline builder and scene assembly in memory (the equivalent of
running exaBuilder then launching the viewer on the result)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from .builder.bricker import SAH_ALIKE, build_bricks
from .core.types import Bricks, ScalarField
from .render.scene import build_scene


def bricks_from_build(result) -> Tuple[Bricks, np.ndarray]:
    """Convert a BuildResult into the SoA Bricks table + flattened cellIDs."""
    lowers, sizes, levels, begins, chunks = [], [], [], [], []
    begin = 0
    for b in result.bricks:
        lowers.append(b.lower)
        sizes.append(b.size)
        levels.append(b.level)
        begins.append(begin)
        chunks.append(b.cell_ids.reshape(-1))  # z-major -> x fastest
        begin += b.cell_ids.size
    bricks = Bricks(
        lower=np.stack(lowers).astype(np.int32),
        size=np.stack(sizes).astype(np.int32),
        level=np.asarray(levels, np.int32),
        begin=np.asarray(begins, np.int32),
    )
    return bricks, np.concatenate(chunks).astype(np.int32)


def scene_from_cells(
    lower: np.ndarray,
    level: np.ndarray,
    scalars: Sequence[np.ndarray],
    strategy: str = SAH_ALIKE,
    max_leaf_width: int = 127,
    field_names: Optional[Sequence[str]] = None,
    num_range_channels: Optional[int] = None,
):
    """cells + per-cell scalar arrays -> (scene, bricks, cell_ids, regions, tree)."""
    bricks = None
    try:
        from .native import available, native_build_bricks_flat

        if available():
            # flat SoA marshaling: identical output to
            # build_bricks + bricks_from_build (tests/test_native.py),
            # minus the per-brick Python object round trip
            bricks, cell_ids = native_build_bricks_flat(
                lower, level, strategy, max_leaf_width
            )
    except Exception:
        bricks = None
    if bricks is None:
        result = build_bricks(lower, level, strategy, max_leaf_width)
        bricks, cell_ids = bricks_from_build(result)
    if field_names is None:
        field_names = [f"field{i}" for i in range(len(scalars))]
    fields = [
        ScalarField.from_values(n, v) for n, v in zip(field_names, scalars)
    ]
    scene, regions, tree = build_scene(
        bricks, cell_ids, fields, num_range_channels=num_range_channels
    )
    return scene, bricks, cell_ids, regions, tree
