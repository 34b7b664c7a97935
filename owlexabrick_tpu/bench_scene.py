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


def _exajet_field(z, y, x, n: int, wings: int = 1) -> np.ndarray:
    """The exajet-pattern analytic field on broadcastable (z, y, x)
    grids in [-1, 1] units.  ``wings`` thin wavy sheets ('wing
    surfaces') with a sharp gradient across each, embedded in a smooth
    background whose per-coarse-cell variation stays below the
    raw2cells collapse threshold (0.004) — only the sheets force
    refinement, like geometry-fitted AMR."""
    w = np.float32(6.0 / n)  # a few finest cells thick
    sheet = 0.25 * np.sin(2.4 * x) * np.cos(1.7 * z) - 0.15 * x
    d = y - sheet
    v = 1.0 / (1.0 + np.exp(np.clip(-d / w, -60.0, 60.0)))
    if wings >= 2:
        # a second, offset wing (real exajet carries multiple surfaces);
        # phase-shifted so the sheets stay separated in y
        sheet2 = (0.2 * np.sin(2.4 * x + 2.0) * np.cos(1.7 * z + 1.1)
                  + 0.45 - 0.1 * x)
        d2 = y - sheet2
        v += 1.0 / (1.0 + np.exp(np.clip(-d2 / w, -60.0, 60.0)))
    v += 0.04 * np.exp(-2.0 * (x * x + z * z))
    v += 0.02 * np.exp(
        -8.0 * ((x - 0.5) ** 2 + (y - 0.5) ** 2 + z * z)
    )
    return np.asarray(v, np.float32)


def exajet_pattern_volume(n: int = 256, wings: int = 1) -> np.ndarray:
    """Exajet-*pattern* field as a dense volume: the finest level hugs
    the wing sheets under threshold collapse — the level-population
    pattern of real exajet-class AMR data (fine cells on geometry,
    coarse everywhere else), so the finest level's own bounding box
    stays thin along y."""
    # float32 + open (broadcast) grids: the host here is a slow shared
    # vCPU, and full 3-D float64 meshgrid temps cost minutes at 512^3
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    z = ax[:, None, None]
    y = ax[None, :, None]
    x = ax[None, None, :]
    return _exajet_field(z, y, x, n, wings)


def exajet_pattern_cells(n: int, threshold: float = 0.004,
                         max_level: int = 3, wings: int = 1):
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
    lowers, levels, scals = [], [], []
    for z0 in range(0, n, w):
        z = ax[z0 : z0 + w][:, None, None]
        v = _exajet_field(z, y, x, n, wings)
        lo, lv, sc = volume_to_cells(v, threshold, max_level)
        lo[:, 2] += z0
        lowers.append(lo)
        levels.append(lv)
        scals.append(sc)
    return (
        np.concatenate(lowers),
        np.concatenate(levels),
        np.concatenate(scals),
    )


def load_or_build_scale_scene(n: int = 1024, wings: int = 2,
                              cache_dir: str = ".bench_cache",
                              verbose: bool = True):
    """The reference-scale bench scene (>=1024^3 finest lattice,
    >=5e7 cells): streaming cell generation -> native builder -> region
    scene -> host-side level grids, cached on disk because the full
    build costs ~10 min on this 1-vCPU host (the reference's exajet
    preprocessing is likewise a one-time offline step,
    /root/reference/README.md:120-175).

    Returns (bricks, scalars (C, cells) float32, grids_host LevelGrids
    numpy, meta dict).  meta carries n_cells / n_bricks / build times.
    """
    import os
    import pickle
    import time

    from .render.slabs import build_level_grids

    os.makedirs(cache_dir, exist_ok=True)
    tag = f"scale_{n}_{wings}"
    path = os.path.join(cache_dir, tag + ".pkl")
    if os.path.exists(path):
        t0 = time.time()
        with open(path, "rb") as f:
            bricks, scalars, grids, meta = pickle.load(f)
        # caches written before build_level_grids 8-aligned ny: pad the
        # y axis (zero-mask rows, exact) so the per-frame camera
        # products skip the _pad8_rows mid copies
        from .render.slabs import align_grids_rows

        grids = align_grids_rows(grids)
        meta = dict(meta, cache_load_s=round(time.time() - t0, 1))
        return bricks, scalars, grids, meta

    from .core.types import Bricks

    # staged cache: cells and bricks are each ~10 min on this 1-vCPU
    # host; keep them if a later stage is interrupted
    cpath = os.path.join(cache_dir, tag + "_cells.npz")
    if os.path.exists(cpath):
        z = np.load(cpath)
        lower, level, scal = z["lower"], z["level"], z["scal"]
        t_gen = float(z["t_gen"])
    else:
        t0 = time.time()
        lower, level, scal = exajet_pattern_cells(n, wings=wings)
        t_gen = time.time() - t0
        np.savez(cpath, lower=lower, level=level, scal=scal, t_gen=t_gen)
    n_cells = int(lower.shape[0])
    if verbose:
        print(f"# scale scene: {n_cells/1e6:.1f}M cells "
              f"generated in {t_gen:.0f}s", flush=True)
    # bricks only — the slab fast path consumes dense level grids, not
    # the wavefront path's region BSP (25M regions at this scale; its
    # native build is exercised at smaller sizes by tests/benchmarks)
    bpath = os.path.join(cache_dir, tag + "_bricks.npz")
    if os.path.exists(bpath):
        z = np.load(bpath)
        bricks = Bricks(lower=z["b_lower"], size=z["b_size"],
                        level=z["b_level"], begin=z["b_begin"])
        cell_ids = z["cell_ids"]
        t_build = float(z["t_build"])
    else:
        t0 = time.time()
        try:
            from .native import available, native_build_bricks_flat

            assert available()
            bricks, cell_ids = native_build_bricks_flat(lower, level)
        except Exception:
            from .builder.bricker import build_bricks
            from .pipeline import bricks_from_build

            bricks, cell_ids = bricks_from_build(
                build_bricks(lower, level))
        t_build = time.time() - t0
        np.savez(bpath, b_lower=bricks.lower, b_size=bricks.size,
                 b_level=bricks.level, b_begin=bricks.begin,
                 cell_ids=cell_ids, t_build=t_build)
    if verbose:
        print(f"# scale scene: {bricks.num_bricks} bricks built in "
              f"{t_build:.0f}s", flush=True)
    del lower, level
    scalars = scal[np.asarray(cell_ids, np.int64)][None].astype(np.float32)
    del cell_ids
    t0 = time.time()
    grids = build_level_grids(bricks, scalars, axis=2, device=False)
    t_grids = time.time() - t0
    meta = dict(
        n_cells=n_cells,
        n_bricks=int(bricks.num_bricks),
        finest_lattice=n,
        gen_s=round(t_gen, 1),
        build_s=round(t_build, 1),
        grids_s=round(t_grids, 1),
        grid_bytes=int(
            sum(v.size * 4 for v in grids.vals)
            + sum(m.size * 4 for m in grids.masks)
        ),
        value_max=float(scal.max()),
    )
    with open(path, "wb") as f:
        pickle.dump((bricks, scalars, grids, meta), f, protocol=4)
    return bricks, scalars, grids, meta


def slab_scene_grids(kind: str, n: int, cache_dir: str = ".bench_cache",
                     threshold: float = 0.004, max_level: int = 3):
    """Bricks + host-side level grids for the slab fast path only (no
    region BSP — the sweep consumes dense level grids), disk-cached so
    bench/tune iterations skip the multi-minute 256^3+ scene builds.

    Returns (grids_host LevelGrids numpy, meta dict with n_cells /
    n_bricks / build_s or cache_load_s / value_max)."""
    import os
    import pickle
    import time

    from .render.slabs import build_level_grids

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"slab_{kind}_{n}.pkl")
    if os.path.exists(path):
        t0 = time.time()
        with open(path, "rb") as f:
            grids, meta = pickle.load(f)
        from .render.slabs import align_grids_rows

        grids = align_grids_rows(grids)  # pre-ny8 caches (exact pad)
        meta = dict(meta, cache_load_s=round(time.time() - t0, 1))
        return grids, meta

    t0 = time.time()
    vol = (exajet_pattern_volume(n) if kind == "exajet"
           else synthetic_volume(n))
    lower, level, scal = volume_to_cells(vol, threshold, max_level)
    try:
        from .native import available, native_build_bricks_flat

        assert available()
        bricks, cell_ids = native_build_bricks_flat(lower, level)
    except Exception:
        from .builder.bricker import build_bricks
        from .pipeline import bricks_from_build

        bricks, cell_ids = bricks_from_build(build_bricks(lower, level))
    scalars = scal[np.asarray(cell_ids, np.int64)][None].astype(np.float32)
    grids = build_level_grids(bricks, scalars, axis=2, device=False)
    meta = dict(
        n_cells=int(lower.shape[0]),
        n_bricks=int(bricks.num_bricks),
        build_s=round(time.time() - t0, 1),
        value_max=float(scal.max()),
    )
    with open(path, "wb") as f:
        pickle.dump((grids, meta), f, protocol=4)
    return grids, meta


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
