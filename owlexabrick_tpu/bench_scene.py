"""Shared benchmark scene construction: synthetic multi-level AMR volume
(the reproducible-without-data config from BASELINE.md: structured volume
-> raw2cells threshold collapse -> builder -> regions)."""

from __future__ import annotations

import numpy as np

from .pipeline import scene_from_cells
from .tools.raw2cells import volume_to_cells


def synthetic_volume(n: int = 64) -> np.ndarray:
    """Smooth multi-scale field: blobs + a shell, gives a real AMR level
    mix under threshold collapse."""
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    z = ax[:, None, None]
    y = ax[None, :, None]
    x = ax[None, None, :]
    r = np.sqrt(x * x + y * y + z * z)
    v = np.exp(-18 * ((x - 0.3) ** 2 + (y - 0.2) ** 2 + z ** 2))
    v = v + 0.8 * np.exp(-24 * ((x + 0.4) ** 2 + y ** 2 + (z - 0.3) ** 2))
    v += 0.6 * np.exp(-60 * (r - 0.7) ** 2)
    return np.asarray(v, np.float32)


def exajet_pattern_volume(n: int = 256) -> np.ndarray:
    """Exajet-*pattern* field: a thin wavy sheet (the 'wing surface') with
    a sharp gradient across it embedded in a smooth background.  Under
    raw2cells threshold collapse the finest level hugs the sheet — the
    level-population pattern of real exajet-class AMR data (fine cells on
    geometry, coarse everywhere else), so the finest level's own bounding
    box stays thin along y."""
    # float32 + open (broadcast) grids: the host here is a slow shared
    # vCPU, and full 3-D float64 meshgrid temps cost minutes at 512^3
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    z = ax[:, None, None]
    y = ax[None, :, None]
    x = ax[None, None, :]
    sheet = 0.25 * np.sin(2.4 * x) * np.cos(1.7 * z) - 0.15 * x  # (n,1,n)
    d = y - sheet  # broadcasts to (n, n, n)
    w = np.float32(6.0 / n)  # a few finest cells thick
    # background amplitudes sized so their per-coarse-cell variation
    # stays below the raw2cells collapse threshold (0.004): only the
    # sheet forces refinement, like geometry-fitted AMR
    v = 1.0 / (1.0 + np.exp(np.clip(-d / w, -60.0, 60.0)))
    v += 0.04 * np.exp(-2.0 * (x * x + z * z))
    v += 0.02 * np.exp(
        -8.0 * ((x - 0.5) ** 2 + (y - 0.5) ** 2 + z * z)
    )
    return np.asarray(v, np.float32)


def exajet_pattern_cells(n: int, threshold: float = 0.004,
                         max_level: int = 3):
    """Streaming cells for an exajet-pattern volume of ``n``^3 finest
    lattice WITHOUT materializing the dense volume (4 GB at 1024^3).

    The raw2cells octree collapse (tools/raw2cells.py) is local to
    2^max_level-aligned root blocks, so the volume streams in z-chunks
    of 2^max_level planes: each chunk is generated analytically,
    collapsed independently, and its cell z-coordinates offset — the
    result is bit-identical to volume_to_cells(exajet_pattern_volume(n))
    (tests/test_scale_scene.py).  Returns (lower (N,3) int32, level,
    scalars) like volume_to_cells."""
    w = 1 << max_level
    assert n % w == 0, "finest lattice must be a multiple of 2^max_level"
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    y = ax[None, :, None]
    x = ax[None, None, :]
    ws = np.float32(6.0 / n)
    lowers, levels, scals = [], [], []
    for z0 in range(0, n, w):
        z = ax[z0 : z0 + w][:, None, None]
        sheet = 0.25 * np.sin(2.4 * x) * np.cos(1.7 * z) - 0.15 * x
        d = y - sheet
        v = 1.0 / (1.0 + np.exp(np.clip(-d / ws, -60.0, 60.0)))
        v += 0.04 * np.exp(-2.0 * (x * x + z * z))
        v += 0.02 * np.exp(
            -8.0 * ((x - 0.5) ** 2 + (y - 0.5) ** 2 + z * z)
        )
        lo, lv, sc = volume_to_cells(
            np.asarray(v, np.float32), threshold, max_level
        )
        lo[:, 2] += z0
        lowers.append(lo)
        levels.append(lv)
        scals.append(sc)
    return (
        np.concatenate(lowers),
        np.concatenate(levels),
        np.concatenate(scals),
    )


def build_bench_scene(n: int = 64, threshold: float = 0.004,
                      max_level: int = 3):
    vol = synthetic_volume(n)
    lower, level, scal = volume_to_cells(vol, threshold, max_level)
    scene, bricks, cell_ids, regions, tree = scene_from_cells(
        lower, level, [scal]
    )
    return scene, dict(
        n_cells=int(lower.shape[0]),
        n_bricks=int(bricks.num_bricks),
        n_regions=int(regions.num_regions),
        max_bricks_per_region=int(regions.max_bricks_per_region),
        tree_depth=int(tree.depth),
        levels=np.bincount(level).tolist(),
        value_max=float(scal.max()),
    )
