"""Row-packed wavefront DVR: the gather-bandwidth redesign of trace_dvr.

TPU gathers cost ~0.1 G *rows*/s regardless of row width (measured: a
512-float row costs the same as a 1-float row), so the accelerated
wavefront path packs everything a ray step needs into single wide rows:

  * BSP point location descends over a packed (n_nodes, 12) table —
    axis/split/child/leaf + leaf box in ONE gather row per step (the
    float-keyed analog of locate_leaf's 3 separate gathers), seeded by a
    dense start grid that maps a finest-lattice macro cell to the deepest
    BSP node containing it (cutting the descent from tree depth to the
    local sub-depth).
  * basis-function sampling gathers, per (sample, level), ONE
    neighborhood row holding the 2x2 (z, y) value+mask sub-rows over a
    (B+1)-cell x window — the whole trilinear support in one row — and
    reduces it with tent weights on the VPU.  This replaces sample_basis'
    (K bricks x 8 corners) scalar gathers; the field itself is identical:
    the dense per-level grids hold the same cell values the brick basis
    sum reads (see render/slabs.py:build_level_grids).

Semantics match trace_dvr exactly (same region traversal, same per-region
lattice stepping, same opacity correction/termination as
exabrick.cu:1116-1185, 1662-1699); values differ from the brick-ordered
sum only by float32 summation order.  Golden-tested against trace_dvr in
tests/test_wavefront_packed.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.constants import (
    REGION_ADVANCE_EPS,
    TERMINATION_THRESHOLD,
)
from .dvr import RenderConfig, ray_box, region_active_mask
from .xf import lookup_xf

_XB = 16  # x-window block size (cells per neighborhood row)


from functools import partial


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("node_pack", "start_grid", "rows"),
    meta_fields=(
        "grid_org", "grid_cw", "grid_dims", "descent", "level_org",
        "level_dims", "level_cw", "num_channels", "channel_stride",
    ),
)
@dataclass(frozen=True)
class WavefrontPack:
    """Precomputed row-gather tables for one scene (host-built, cached)."""

    node_pack: jax.Array  # (n_nodes, 12) f32: axis,split,child,leaf,lo3,hi3,pad2
    start_grid: jax.Array  # (gz*gy*gx,) int32 start node per macro cell
    # per level: (nz*ny*nxb, 8*(XB+1)) f32 rows [v00,v01,v10,v11,m00,..]
    rows: Tuple[jax.Array, ...]
    grid_org: Tuple[float, float, float]  # world coords of cell (0,0,0) (x,y,z)
    grid_cw: float  # macro cell width
    grid_dims: Tuple[int, int, int]  # (gx, gy, gz)
    descent: int  # static bound on remaining descent depth
    level_org: Tuple[Tuple[float, float, float], ...]  # (z,y,x) lattice org
    level_dims: Tuple[Tuple[int, int, int], ...]  # (nz, ny, nx)
    level_cw: Tuple[float, ...]
    num_channels: int
    # per level: rows per channel (channels stacked along axis 0)
    channel_stride: Tuple[int, ...]


def _subtree_depths(axis, child):
    n = axis.shape[0]
    depth = np.zeros(n, np.int32)
    # nodes are emitted parent-before-child by the builder, so a reverse
    # sweep sees children first
    for i in range(n - 1, -1, -1):
        if axis[i] < 3:
            c = child[i]
            depth[i] = 1 + max(depth[c], depth[c + 1])
    return depth


def build_pack(scene, grids, max_grid_cells: int = 1 << 23,
               verbose: bool = False) -> WavefrontPack:
    """Build the row tables from a device Scene + its LevelGrids
    (axis=2 orientation: grid (z, y, x) = world (z, y, x))."""
    import time as _time

    _t0 = _time.time()

    def _tick(msg):
        nonlocal _t0
        if verbose:
            print(f"# build_pack {msg}: {_time.time() - _t0:.1f}s",
                  flush=True)
        _t0 = _time.time()

    axis = np.asarray(scene.tree_axis)
    split = np.asarray(scene.tree_split)
    child = np.asarray(scene.tree_child)
    leaf = np.asarray(scene.tree_leaf)
    lo = np.asarray(scene.tree_lo)
    hi = np.asarray(scene.tree_hi)
    n = axis.shape[0]
    if n >= (1 << 24) or leaf.max(initial=0) >= (1 << 24):
        raise ValueError("node/region ids exceed exact float32 range")

    pack = np.zeros((n, 12), np.float32)
    pack[:, 0] = axis
    pack[:, 1] = split
    pack[:, 2] = child
    pack[:, 3] = leaf
    pack[:, 4:7] = lo
    pack[:, 7:10] = hi

    # ---- start grid: deepest node containing each macro cell ----
    # every region face is a multiple of half the finest cell width
    # (brick domains pad bounds by 0.5*cw, ExaBricks.h:55-60), so a
    # half-cell start grid has NO straddling cells: the descent bound
    # collapses to ~0 and point location becomes one grid row + one node
    # row per region visit
    root_lo = lo[0]
    root_hi = hi[0]
    ext = np.maximum(root_hi - root_lo, 1e-6)
    cw = 0.5
    while (np.ceil(ext / cw).prod()) > max_grid_cells:
        cw *= 2.0
    gx, gy, gz = (int(np.ceil(ext[a] / cw)) for a in range(3))
    start = np.zeros((gz, gy, gx), np.int32)
    depths = _subtree_depths(axis, child)

    # recursive box-range assignment: a macro cell advances into a child
    # only if it lies fully inside that child's half-space
    def assign(node, c_lo, c_hi):
        # c_lo/c_hi: inclusive/exclusive cell index ranges (x, y, z)
        while axis[node] < 3:
            a = int(axis[node])
            s = float(split[node])
            # cell i spans [root_lo+a_i*cw, +cw); fully left of s iff
            # (i+1)*cw + root_lo <= s
            i_left_end = int(np.floor((s - root_lo[a]) / cw + 1e-9))
            i_right_start = int(np.ceil((s - root_lo[a]) / cw - 1e-9))
            c = int(child[node])
            if i_left_end >= c_hi[a]:
                node = c  # whole range inside the left child
                continue
            if i_right_start <= c_lo[a]:
                node = c + 1
                continue
            # split the range; straddling cells (between the two bounds)
            # stay at this node
            left_hi = list(c_hi)
            left_hi[a] = min(c_hi[a], i_left_end)
            right_lo = list(c_lo)
            right_lo[a] = max(c_lo[a], i_right_start)
            if left_hi[a] > c_lo[a]:
                assign(c, list(c_lo), left_hi)
            if c_hi[a] > right_lo[a]:
                assign(c + 1, right_lo, list(c_hi))
            mid_lo = list(c_lo)
            mid_hi = list(c_hi)
            mid_lo[a] = max(c_lo[a], i_left_end)
            mid_hi[a] = min(c_hi[a], i_right_start)
            if mid_hi[a] <= mid_lo[a]:
                return
            c_lo, c_hi = mid_lo, mid_hi
            start[c_lo[2]:c_hi[2], c_lo[1]:c_hi[1], c_lo[0]:c_hi[0]] = node
            return
        start[c_lo[2]:c_hi[2], c_lo[1]:c_hi[1], c_lo[0]:c_hi[0]] = node

    import sys

    _tick("download+grid setup")
    rec = sys.getrecursionlimit()
    sys.setrecursionlimit(max(rec, 10000))
    start[:] = 0
    assign(0, [0, 0, 0], [gx, gy, gz])
    sys.setrecursionlimit(rec)
    descent = int(depths[start].max(initial=0))
    _tick("start-grid assign")

    # ---- per-level neighborhood rows ----
    c = grids.num_channels
    rows = []
    orgs = []
    dims = []
    cws = []
    for li, L in enumerate(grids.levels):
        v = np.asarray(grids.vals[li])  # (C, nz, ny, nx)
        m = np.asarray(grids.masks[li])
        nz, ny, nx = m.shape
        nz2, ny2 = max(nz, 2), max(ny, 2)
        nxb = max(-(-nx // _XB), 1)
        xw = _XB + 1

        def windows(a3):  # (nz2, ny2, nxb, xw) from (nz, ny, nx)
            a = np.zeros((nz2, ny2, nxb * _XB + 1), np.float32)
            a[:nz, :ny, :nx] = a3
            out = np.empty((nz2, ny2, nxb, xw), np.float32)
            for b in range(nxb):
                out[:, :, b] = a[:, :, b * _XB : b * _XB + xw]
            return out

        per_ch = []
        wm = windows(m)
        for ci in range(c):
            wv = windows(v[ci])
            sub = np.empty((nz2 - 1, ny2 - 1, nxb, 8, xw), np.float32)
            sub[..., 0, :] = wv[:-1, :-1]
            sub[..., 1, :] = wv[:-1, 1:]
            sub[..., 2, :] = wv[1:, :-1]
            sub[..., 3, :] = wv[1:, 1:]
            sub[..., 4, :] = wm[:-1, :-1]
            sub[..., 5, :] = wm[:-1, 1:]
            sub[..., 6, :] = wm[1:, :-1]
            sub[..., 7, :] = wm[1:, 1:]
            per_ch.append(sub.reshape(-1, 8 * xw))
        rows.append(jnp.asarray(np.concatenate(per_ch, axis=0)))
        _tick(f"level {li} rows")
        orgs.append(tuple(float(x) for x in np.asarray(grids.origins[li])))
        dims.append((nz2, ny2, nxb))
        cws.append(float(1 << L))

    return WavefrontPack(
        node_pack=jnp.asarray(pack),
        start_grid=jnp.asarray(start.reshape(-1)),
        grid_org=tuple(float(x) for x in root_lo),
        grid_cw=float(cw),
        grid_dims=(gx, gy, gz),
        descent=descent,
        rows=tuple(rows),
        level_org=tuple(orgs),
        level_dims=tuple(dims),
        level_cw=tuple(cws),
        num_channels=c,
        channel_stride=tuple(r.shape[0] // c for r in rows),
    )


# ----------------------------------------------------------------------------
# device-side primitives
# ----------------------------------------------------------------------------

def locate_packed(pack: WavefrontPack, p):
    """(leaf_region, box_lo, box_hi) for points p (P, 3) via start grid +
    packed-node descent."""
    gx, gy, gz = pack.grid_dims
    org = jnp.asarray(pack.grid_org)
    ci = jnp.floor((p - org) / pack.grid_cw).astype(jnp.int32)
    ci = jnp.clip(ci, 0, jnp.asarray([gx - 1, gy - 1, gz - 1]))
    cell = (ci[:, 2] * gy + ci[:, 1]) * gx + ci[:, 0]
    node = pack.start_grid[cell]

    row = pack.node_pack[node]  # (P, 12) — one wide gather per step

    def body(_, carry):
        node, row = carry
        ax = row[:, 0].astype(jnp.int32)
        is_inner = ax < 3
        axc = jnp.clip(ax, 0, 2)
        pax = jnp.take_along_axis(p, axc[:, None], axis=1)[:, 0]
        go_right = (pax >= row[:, 1]).astype(jnp.int32)
        nxt = jnp.where(is_inner, row[:, 2].astype(jnp.int32) + go_right,
                        node)
        nrow = pack.node_pack[nxt]
        return nxt, nrow

    node, row = lax.fori_loop(0, pack.descent, body, (node, row))
    rid = row[:, 3].astype(jnp.int32)
    return rid, row[:, 4:7], row[:, 7:10]


def sample_packed(pack: WavefrontPack, pos, channel: int):
    """(ok, value) of the basis field at (P, 3) voxel points — one
    neighborhood-row gather per level, tent reduction on the VPU."""
    xw = _XB + 1
    sw = 0.0
    swv = 0.0
    for li in range(len(pack.rows)):
        cw = pack.level_cw[li]
        oz, oy, ox = pack.level_org[li]
        nz2, ny2, nxb = pack.level_dims[li]
        q = pos / cw
        qz = q[:, 2] - oz - 0.5
        qy = q[:, 1] - oy - 0.5
        qx = q[:, 0] - ox - 0.5
        k0z = jnp.clip(jnp.floor(qz).astype(jnp.int32), 0, nz2 - 2)
        k0y = jnp.clip(jnp.floor(qy).astype(jnp.int32), 0, ny2 - 2)
        xb = jnp.clip(
            (jnp.floor(qx) / _XB).astype(jnp.int32), 0, nxb - 1
        )
        idx = (k0z * (ny2 - 1) + k0y) * nxb + xb
        tab = pack.rows[li]
        if pack.num_channels > 1:
            idx = idx + channel * pack.channel_stride[li]
        row = tab[idx].reshape(-1, 8, xw)  # THE gather: one row per level

        k0zf = k0z.astype(qz.dtype)
        k0yf = k0y.astype(qy.dtype)
        wz0 = jnp.maximum(0.0, 1.0 - jnp.abs(qz - k0zf))
        wz1 = jnp.maximum(0.0, 1.0 - jnp.abs(qz - (k0zf + 1.0)))
        wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(qy - k0yf))
        wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(qy - (k0yf + 1.0)))
        xcoord = (xb * _XB)[:, None] + jnp.arange(xw, dtype=qx.dtype)[None]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(qx[:, None] - xcoord))  # (P, xw)

        wzy = jnp.stack(
            [wz0 * wy0, wz0 * wy1, wz1 * wy0, wz1 * wy1], axis=1
        )  # (P, 4)
        vdot = (row[:, :4] * wx[:, None, :]).sum(-1)  # (P, 4)
        mdot = (row[:, 4:] * wx[:, None, :]).sum(-1)
        swv = swv + (wzy * vdot).sum(-1)
        sw = sw + (wzy * mdot).sum(-1)
    ok = sw > 1e-20
    return ok, swv / jnp.where(ok, sw, 1.0)


# ----------------------------------------------------------------------------
# the integrator (trace_dvr with packed primitives)
# ----------------------------------------------------------------------------

def _march_region_packed(pack, scene, fs, cfg, o, d, rid, active, t0, t1,
                         offset, rgba):
    finest_cw = scene.region_finest_cw[jnp.clip(rid, 0, None)]
    dt = fs.dt * finest_cw

    i0 = jnp.ceil((t0 - dt * offset) / dt)
    t_i = (offset + i0) * dt
    for _ in range(3):
        t_i = jnp.where(t_i - dt >= t0, t_i - dt, t_i)
    for _ in range(3):
        t_i = jnp.where(t_i < t0, t_i + dt, t_i)

    marching = active & (t1 > t0)
    t_last = t0

    def cond(state):
        marching, *_ = state
        return marching.any()

    def body(state):
        marching, t_i, t_last, rgba = state
        t_next = jnp.minimum(t_i, t1)
        t_sample = 0.5 * (jnp.minimum(t1, t_next) + t_last)
        actual_dt = t_next - t_last
        pos = o + t_sample[:, None] * d

        for c in range(cfg.num_channels):
            ok, value = sample_packed(pack, pos, c)
            sample = lookup_xf(
                fs.xf_lut[c], fs.xf_domain[c], fs.xf_opacity_scale, value
            )
            rgb, a = sample[:, :3], sample[:, 3]
            a = 1.0 - (1.0 - a) ** actual_dt
            take = marching & ok & (actual_dt != 0.0)
            contrib = jnp.where(take, (1.0 - rgba[:, 3]) * a, 0.0)
            rgba = jnp.concatenate(
                [rgba[:, :3] + contrib[:, None] * rgb,
                 (rgba[:, 3] + contrib)[:, None]],
                axis=1,
            )

        stop = (rgba[:, 3] >= TERMINATION_THRESHOLD) | (t_next >= t1)
        return marching & ~stop, t_i + dt, t_next, rgba

    _, _, _, rgba = lax.while_loop(cond, body, (marching, t_i, t_last, rgba))
    return rgba


def trace_dvr_packed(pack: WavefrontPack, scene, fs, cfg: RenderConfig,
                     o_world, d_world, offset,
                     t_end_world=None, t_start_world=None):
    """Row-packed twin of trace_dvr (same region traversal + quadrature);
    supports the default feature set (basis sampling, no gradient
    shading).  Returns accumulated RGBA (P, 4)."""
    if cfg.gradient_shading_dvr or not cfg.basis_method:
        raise ValueError("packed wavefront supports the default "
                         "basis/no-gradient configuration; use trace_dvr")
    p = o_world.shape[0]
    m = scene.voxel_from_world
    hi = lax.Precision.HIGHEST
    o = jnp.matmul(o_world, m[:, :3].T, precision=hi) + m[:, 3]
    d = jnp.matmul(d_world, m[:, :3].T, precision=hi)
    dt_scale = jnp.linalg.norm(d, axis=-1)
    d = d / dt_scale[:, None]

    t_end = (jnp.full(p, 2e10, o.dtype) if t_end_world is None
             else t_end_world * dt_scale)
    t_start = (jnp.zeros(p, o.dtype) if t_start_world is None
               else t_start_world * dt_scale)

    hitb, tb0, tb1 = ray_box(
        o, d, scene.tree_lo[0], scene.tree_hi[0], t_start, t_end,
    )

    if cfg.space_skipping:
        act_mask = region_active_mask(scene, fs, cfg.num_channels)
    else:
        act_mask = jnp.ones(scene.region_value_range.shape[0], bool)

    span = jnp.maximum(tb1 - tb0, 0.0)
    eps = jnp.maximum(span * 1e-6, 1e-5)

    rgba0 = jnp.zeros((p, 4), o.dtype) + 0.0 * o[:, :1]
    done0 = ~hitb
    t_cur0 = jnp.maximum(tb0, 0.0)

    def cond(state):
        it, done, *_ = state
        return (it < cfg.max_region_iters) & ~done.all()

    def body(state):
        it, done, t_cur, rgba = state
        limit = jnp.minimum(t_end, tb1)
        alive = ~done & (t_cur < limit)

        probe = o + jnp.minimum(t_cur + eps, limit)[:, None] * d
        rid, lo, hi_ = locate_packed(pack, probe)
        hit, t0, t1 = ray_box(o, d, lo, hi_, t_cur, limit)
        t1 = jnp.where(hit, t1, t_cur + eps)

        active = alive & hit & (rid >= 0) & act_mask[jnp.clip(rid, 0, None)]
        rgba = _march_region_packed(
            pack, scene, fs, cfg, o, d, jnp.clip(rid, 0, None), active,
            t0, t1, offset, rgba,
        )

        saturated = rgba[:, 3] >= TERMINATION_THRESHOLD
        newly = alive & saturated & ~done
        rgba = jnp.where(
            newly[:, None],
            jnp.concatenate(
                [rgba[:, :3] * rgba[:, 3:4], jnp.ones((p, 1), rgba.dtype)],
                axis=1,
            ),
            rgba,
        )
        done = done | ~alive | saturated
        t_cur = jnp.where(alive, t1 * REGION_ADVANCE_EPS, t_cur)
        done = done | (t_cur >= limit)
        return it + 1, done, t_cur, rgba

    _, _, _, rgba = lax.while_loop(cond, body, (0, done0, t_cur0, rgba0))
    return rgba
