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


def _packed_init(pack, scene, fs, cfg, o_world, d_world, offset,
                 t_end_world, t_start_world):
    """Shared per-ray state setup for the packed integrators."""
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
    span = jnp.maximum(tb1 - tb0, 0.0)
    eps = jnp.maximum(span * 1e-6, 1e-5)
    return dict(
        o=o, d=d, offset=offset,
        limit=jnp.minimum(t_end, tb1), eps=eps,
        done=~hitb, t_cur=jnp.maximum(tb0, 0.0),
        rgba=jnp.zeros((p, 4), o.dtype) + 0.0 * o[:, :1],
    )


def _packed_body(pack, scene, fs, cfg, act_mask, st):
    """One region iteration over a ray-state dict (elementwise per ray —
    batch membership never changes a ray's op sequence, which is what
    keeps the compacted orchestrator equivalent)."""
    p = st["o"].shape[0]
    alive = ~st["done"] & (st["t_cur"] < st["limit"])

    probe = st["o"] + jnp.minimum(
        st["t_cur"] + st["eps"], st["limit"]
    )[:, None] * st["d"]
    rid, lo, hi_ = locate_packed(pack, probe)
    hit, t0, t1 = ray_box(st["o"], st["d"], lo, hi_, st["t_cur"],
                          st["limit"])
    t1 = jnp.where(hit, t1, st["t_cur"] + st["eps"])

    active = alive & hit & (rid >= 0) & act_mask[jnp.clip(rid, 0, None)]
    rgba = _march_region_packed(
        pack, scene, fs, cfg, st["o"], st["d"], jnp.clip(rid, 0, None),
        active, t0, t1, st["offset"], st["rgba"],
    )

    saturated = rgba[:, 3] >= TERMINATION_THRESHOLD
    newly = alive & saturated & ~st["done"]
    rgba = jnp.where(
        newly[:, None],
        jnp.concatenate(
            [rgba[:, :3] * rgba[:, 3:4], jnp.ones((p, 1), rgba.dtype)],
            axis=1,
        ),
        rgba,
    )
    done = st["done"] | ~alive | saturated
    t_cur = jnp.where(alive, t1 * REGION_ADVANCE_EPS, st["t_cur"])
    done = done | (t_cur >= st["limit"])
    return dict(st, done=done, t_cur=t_cur, rgba=rgba)


def trace_dvr_packed(pack: WavefrontPack, scene, fs, cfg: RenderConfig,
                     o_world, d_world, offset,
                     t_end_world=None, t_start_world=None):
    """Row-packed twin of trace_dvr (same region traversal + quadrature);
    supports the default feature set (basis sampling, no gradient
    shading).  Returns accumulated RGBA (P, 4)."""
    if cfg.gradient_shading_dvr or not cfg.basis_method:
        raise ValueError("packed wavefront supports the default "
                         "basis/no-gradient configuration; use trace_dvr")
    st0 = _packed_init(pack, scene, fs, cfg, o_world, d_world, offset,
                       t_end_world, t_start_world)
    if cfg.space_skipping:
        act_mask = region_active_mask(scene, fs, cfg.num_channels)
    else:
        act_mask = jnp.ones(scene.region_value_range.shape[0], bool)

    def cond(state):
        it, st = state
        return (it < cfg.max_region_iters) & ~st["done"].all()

    def body(state):
        it, st = state
        return it + 1, _packed_body(pack, scene, fs, cfg, act_mask, st)

    _, st = lax.while_loop(cond, body, (0, st0))
    return st["rgba"]


@partial(jax.jit, static_argnames=("cfg", "k"))
def _packed_rounds(pack, scene, fs, cfg, act_mask, st, k: int):
    def body(_, st):
        return _packed_body(pack, scene, fs, cfg, act_mask, st)

    return lax.fori_loop(0, k, body, st)


@partial(jax.jit, static_argnames=("half",))
def _packed_compact(st, idx, half: int):
    """Alive-first stable partition, split at ``half``: returns the
    compacted live state + kept indices, and the retired (rgba, idx)."""
    order = jnp.argsort(st["done"].astype(jnp.int32), stable=True)
    keep = order[:half]
    drop = order[half:]
    return (
        {k: v[keep] for k, v in st.items()},
        idx[keep],
        st["rgba"][drop],
        idx[drop],
    )


def trace_dvr_packed_compacted(
    pack: WavefrontPack, scene, fs, cfg: RenderConfig,
    o_world, d_world, offset, t_end_world=None, t_start_world=None,
    round_iters: int = 16, min_size: int = 8192,
):
    """Binned/compacted wavefront (VERDICT r2 task 7): the packed
    integrator's lockstep cost is per-iteration x ALL rays (masked lanes
    still pay their gathers), and the iteration count is set by the
    slowest ray (grazing rays visit ~200 regions).  This host
    orchestrator runs ``round_iters`` region iterations at a time and
    halves the ray queue (alive-first stable partition) whenever at
    least half the rays finished, so the expensive tail iterations run
    on geometrically shrinking batches.

    Per-ray op sequences are identical to trace_dvr_packed (elementwise
    bodies); outputs agree to float reassociation noise (XLA codegen
    varies with the static batch size) — golden-tested at 2e-5.  Each
    round costs one device->host sync (~25-30 ms through the dev
    tunnel)."""
    if cfg.gradient_shading_dvr or not cfg.basis_method:
        raise ValueError("packed wavefront supports the default "
                         "basis/no-gradient configuration; use trace_dvr")
    p = o_world.shape[0]
    st = _packed_init(pack, scene, fs, cfg, o_world, d_world, offset,
                      t_end_world, t_start_world)
    if cfg.space_skipping:
        act_mask = region_active_mask(scene, fs, cfg.num_channels)
    else:
        act_mask = jnp.ones(scene.region_value_range.shape[0], bool)

    out = jnp.zeros((p, 4), jnp.float32)
    idx = jnp.arange(p, dtype=jnp.int32)
    size = p
    it = 0
    while it < cfg.max_region_iters:
        st = _packed_rounds(pack, scene, fs, cfg, act_mask, st,
                            round_iters)
        it += round_iters
        n_alive = int(np.asarray((~st["done"]).sum()))  # host sync
        if n_alive == 0:
            break
        while size > min_size and n_alive <= size // 2:
            st, idx, rgba_drop, idx_drop = _packed_compact(
                st, idx, size // 2
            )
            out = out.at[idx_drop].set(rgba_drop)
            size //= 2
    return out.at[idx].set(st["rgba"])
