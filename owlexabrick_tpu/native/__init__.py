"""ctypes bindings for the native preprocessing core (exabrick_native.cpp).

Builds the shared library on demand with the bundled Makefile.  Every
entry point has a numpy twin (builder/bricker.py, regions/build.py) with
identical deterministic output; the native path exists for large-dataset
throughput (threaded region value-range scans).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libexabrick_native.so")
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    p = ctypes.c_void_p
    lib.exa_build_bricks.restype = p
    lib.exa_build_bricks.argtypes = [p, p, i64, ctypes.c_int, ctypes.c_int]
    lib.exa_build_num_bricks.restype = i64
    lib.exa_build_num_bricks.argtypes = [p]
    lib.exa_build_num_cells.restype = i64
    lib.exa_build_num_cells.argtypes = [p]
    lib.exa_build_num_kd.restype = i64
    lib.exa_build_num_kd.argtypes = [p]
    lib.exa_build_copy.argtypes = [p] + [p] * 9
    lib.exa_build_free.argtypes = [p]

    lib.exa_build_regions.restype = p
    lib.exa_build_regions.argtypes = [p, p, p, p, i64, p, i64, ctypes.c_int]
    lib.exa_regions_num.restype = i64
    lib.exa_regions_num.argtypes = [p]
    lib.exa_regions_leaf_list_len.restype = i64
    lib.exa_regions_leaf_list_len.argtypes = [p]
    lib.exa_regions_num_nodes.restype = i64
    lib.exa_regions_num_nodes.argtypes = [p]
    lib.exa_regions_depth.restype = ctypes.c_int32
    lib.exa_regions_depth.argtypes = [p]
    lib.exa_regions_copy.argtypes = [p] + [p] * 13
    lib.exa_regions_free.argtypes = [p]
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


_STRATEGIES = {"spatial-median": 0, "sah-alike": 1, "small-brick-count": 2}


def native_build_bricks(lower, level, strategy: str = "sah-alike",
                        max_leaf_width: int = 127):
    """Native cells->bricks; returns a BuildResult like the numpy builder."""
    from ..builder.bricker import BuildResult, BuiltBrick, KdNodeRec

    lib = _load()
    lower = np.ascontiguousarray(lower, np.int32).reshape(-1, 3)
    level = np.ascontiguousarray(level, np.int32).reshape(-1)
    h = lib.exa_build_bricks(
        _ptr(lower), _ptr(level), lower.shape[0],
        _STRATEGIES[strategy], max_leaf_width,
    )
    try:
        m = lib.exa_build_num_bricks(h)
        nc = lib.exa_build_num_cells(h)
        nk = lib.exa_build_num_kd(h)
        b_lower = np.empty((m, 3), np.int32)
        b_size = np.empty((m, 3), np.int32)
        b_level = np.empty(m, np.int32)
        b_begin = np.empty(m, np.int64)
        cell_ids = np.empty(nc, np.int32)
        kd_axis = np.empty(nk, np.int32)
        kd_w0 = np.empty(nk, np.int32)
        kd_lo = np.empty(nk, np.int32)
        kd_ml = np.empty(nk, np.int32)
        lib.exa_build_copy(
            h, _ptr(b_lower), _ptr(b_size), _ptr(b_level), _ptr(b_begin),
            _ptr(cell_ids), _ptr(kd_axis), _ptr(kd_w0), _ptr(kd_lo),
            _ptr(kd_ml),
        )
    finally:
        lib.exa_build_free(h)

    bricks = []
    for i in range(m):
        sx, sy, sz = (int(s) for s in b_size[i])
        beg = int(b_begin[i])
        bricks.append(
            BuiltBrick(
                lower=b_lower[i].copy(),
                level=int(b_level[i]),
                size=b_size[i].copy(),
                cell_ids=cell_ids[beg : beg + sx * sy * sz]
                .reshape(sz, sy, sx)
                .copy(),
            )
        )
    kd = [
        KdNodeRec(
            axis=int(kd_axis[i]),
            split=int(kd_w0[i]) if kd_axis[i] != 3 else 0,
            max_level=int(kd_ml[i]),
            first_child=int(kd_lo[i]) if kd_axis[i] != 3 else 0,
            first_prim=int(kd_w0[i]) if kd_axis[i] == 3 else 0,
            num_prims=int(kd_lo[i]) if kd_axis[i] == 3 else 0,
        )
        for i in range(nk)
    ]
    return BuildResult(bricks=bricks, kd=kd)


def native_build_bricks_flat(lower, level, strategy: str = "sah-alike",
                             max_leaf_width: int = 127):
    """Native cells->bricks returning flat SoA arrays directly:
    (Bricks, cell_ids) exactly as pipeline.bricks_from_build produces
    them (the native core already lays cells out x-fastest in brick
    order with running begin offsets) — skips the ~500k-object
    BuiltBrick round trip that costs minutes at 1024^3 scale."""
    from ..core.types import Bricks

    lib = _load()
    lower = np.ascontiguousarray(lower, np.int32).reshape(-1, 3)
    level = np.ascontiguousarray(level, np.int32).reshape(-1)
    h = lib.exa_build_bricks(
        _ptr(lower), _ptr(level), lower.shape[0],
        _STRATEGIES[strategy], max_leaf_width,
    )
    try:
        m = lib.exa_build_num_bricks(h)
        nc = lib.exa_build_num_cells(h)
        nk = lib.exa_build_num_kd(h)
        b_lower = np.empty((m, 3), np.int32)
        b_size = np.empty((m, 3), np.int32)
        b_level = np.empty(m, np.int32)
        b_begin = np.empty(m, np.int64)
        cell_ids = np.empty(nc, np.int32)
        kd_scratch = [np.empty(nk, np.int32) for _ in range(4)]
        lib.exa_build_copy(
            h, _ptr(b_lower), _ptr(b_size), _ptr(b_level), _ptr(b_begin),
            _ptr(cell_ids), *(_ptr(a) for a in kd_scratch),
        )
    finally:
        lib.exa_build_free(h)
    bricks = Bricks(
        lower=b_lower, size=b_size, level=b_level,
        begin=b_begin.astype(np.int32),
    )
    return bricks, cell_ids


def native_build_regions(bricks, scalars: Optional[np.ndarray],
                         num_channels: Optional[int] = None):
    """Native region build; returns (Regions, RegionTree) like
    regions.build.build_regions."""
    from ..core.types import Regions, RegionTree

    lib = _load()
    b_lower = np.ascontiguousarray(bricks.lower, np.int32)
    b_size = np.ascontiguousarray(bricks.size, np.int32)
    b_level = np.ascontiguousarray(bricks.level, np.int32)
    b_begin = np.ascontiguousarray(bricks.begin, np.int64)
    if scalars is None:
        sc = np.zeros((0, 0), np.float32)
        nchan = 0
        total = 0
    else:
        sc = np.ascontiguousarray(scalars, np.float32)
        if sc.ndim == 1:
            sc = sc[None]
        if num_channels is not None:
            sc = np.ascontiguousarray(sc[:num_channels])
        nchan = sc.shape[0]
        total = sc.shape[1]

    h = lib.exa_build_regions(
        _ptr(b_lower), _ptr(b_size), _ptr(b_level), _ptr(b_begin),
        b_lower.shape[0], _ptr(sc), total, nchan,
    )
    try:
        nr = lib.exa_regions_num(h)
        ll = lib.exa_regions_leaf_list_len(h)
        nt = lib.exa_regions_num_nodes(h)
        depth = lib.exa_regions_depth(h)
        region_lo = np.empty((nr, 3), np.float32)
        region_hi = np.empty((nr, 3), np.float32)
        vrange = np.empty((nr, 2), np.float32)
        finest = np.empty(nr, np.float32)
        leaf_list = np.empty(ll, np.int32)
        leaf_begin = np.empty(nr, np.int64)
        leaf_size = np.empty(nr, np.int64)
        axis = np.empty(nt, np.int32)
        split = np.empty(nt, np.float32)
        child = np.empty(nt, np.int32)
        leaf = np.empty(nt, np.int32)
        node_lo = np.empty((nt, 3), np.float32)
        node_hi = np.empty((nt, 3), np.float32)
        lib.exa_regions_copy(
            h, _ptr(region_lo), _ptr(region_hi), _ptr(vrange), _ptr(finest),
            _ptr(leaf_list), _ptr(leaf_begin), _ptr(leaf_size), _ptr(axis),
            _ptr(split), _ptr(child), _ptr(leaf), _ptr(node_lo), _ptr(node_hi),
        )
    finally:
        lib.exa_regions_free(h)

    if nchan == 0:
        vrange[:, 0] = np.inf
        vrange[:, 1] = -np.inf

    # vectorized padded leaf-list expansion (a Python per-region loop
    # here cost ~an hour at 25M regions on the 1024^3 scale scene)
    max_k = int(leaf_size.max()) if nr else 1
    idx = np.arange(max_k, dtype=np.int64)[None, :]
    valid = idx < leaf_size[:, None]
    pos = np.minimum(leaf_begin[:, None] + idx, max(ll - 1, 0))
    brick_ids = np.where(valid, leaf_list[pos], -1).astype(np.int32)

    regions = Regions(
        domain_lo=region_lo,
        domain_hi=region_hi,
        value_range=vrange,
        finest_cw=finest,
        brick_ids=brick_ids,
        leaf_list=leaf_list,
        leaf_begin=leaf_begin.astype(np.int32),
        leaf_size=leaf_size.astype(np.int32),
    )
    tree = RegionTree(
        axis=axis, split=split, child=child, leaf=leaf,
        node_lo=node_lo, node_hi=node_hi, depth=int(depth),
    )
    return regions, tree


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False
