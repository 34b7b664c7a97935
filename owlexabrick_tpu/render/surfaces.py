"""Surface passes: triangle meshes, contour planes, ambient occlusion.

Mirrors traceSurfaces (programs/exabrick.cu:1475-1529) and the raygen
surface shading + AO (exabrick.cu:1596-1651), vectorized over the ray
batch.  Iso-surfaces and streamlines plug into the same nearest-hit
combiner (see iso.py / tracer.py).

Triangle intersection is brute-force vectorized over a padded (T,)
triangle table — the TPU-first replacement for a two-level BVH at the
mesh sizes the reference viewer handles; rays x triangles batches map
onto the VPU.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import (
    PRIMID_ISOSURFACE,
    PRIMID_PLANE,
    PRIMID_STREAMLINE,
)
from ..core.types import TriangleMesh, _pytree_dataclass
from .xf import lookup_xf

Array = Any


@_pytree_dataclass
class SurfaceData:
    """Flattened triangle soup of every mesh (SurfaceGeomData analog)."""

    tri_v0: Array  # (T, 3) float32
    tri_e1: Array  # (T, 3) float32  (v1 - v0)
    tri_e2: Array  # (T, 3) float32  (v2 - v0)
    tri_n: Array  # (T, 3) float32 normalized geometric normal

    # streamline segments (rounded cones), hidden when seg_t >= timestep
    seg_a: Array  # (S, 3) float32
    seg_b: Array  # (S, 3) float32
    seg_t: Array  # (S,) int32 timestep of the segment's head
    seg_radius: Array  # () float32

    @property
    def num_tris(self) -> int:
        return int(self.tri_v0.shape[0])

    @property
    def num_segments(self) -> int:
        return int(self.seg_a.shape[0])

    @staticmethod
    def empty() -> "SurfaceData":
        z = np.zeros((0, 3), np.float32)
        return SurfaceData(
            tri_v0=z, tri_e1=z, tri_e2=z, tri_n=z,
            seg_a=z, seg_b=z, seg_t=np.zeros(0, np.int32),
            seg_radius=np.float32(2.0),
        )

    @staticmethod
    def from_meshes(meshes: List[TriangleMesh]) -> "SurfaceData":
        if not meshes:
            return SurfaceData.empty()
        v0s, e1s, e2s = [], [], []
        for m in meshes:
            v = np.asarray(m.vertices, np.float32)
            idx = np.asarray(m.indices, np.int64)
            a = v[idx[:, 0]]
            b = v[idx[:, 1]]
            c = v[idx[:, 2]]
            v0s.append(a)
            e1s.append(b - a)
            e2s.append(c - a)
        v0 = np.concatenate(v0s)
        e1 = np.concatenate(e1s)
        e2 = np.concatenate(e2s)
        # Morton centroid order keeps trace_triangles_tiled's chunk
        # bounding spheres tight (pure reordering; nearest-hit
        # semantics and per-tri shading are order-free)
        from .tracer import morton_order

        order = morton_order(v0 + (e1 + e2) / 3.0)
        v0, e1, e2 = v0[order], e1[order], e2[order]
        n = np.cross(e1, e2)
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        z = np.zeros((0, 3), np.float32)
        return SurfaceData(
            tri_v0=v0, tri_e1=e1, tri_e2=e2, tri_n=n.astype(np.float32),
            seg_a=z, seg_b=z, seg_t=np.zeros(0, np.int32),
            seg_radius=np.float32(2.0),
        )


# ----------------------------------------------------------------------------
# triangle soup intersection (Moller-Trumbore, vectorized rays x tris)
# ----------------------------------------------------------------------------

def _ray_triangles(o, d, v0, e1, e2):
    """o,d: (P,3); v0,e1,e2: (T,3). Returns t (P,T) with inf for miss."""
    s1 = jnp.cross(d[:, None, :], e2[None])  # (P,T,3)
    div = (s1 * e1[None]).sum(-1)
    inv = jnp.where(div != 0.0, 1.0 / jnp.where(div == 0.0, 1.0, div), 0.0)
    dd = o[:, None, :] - v0[None]
    b1 = (dd * s1).sum(-1) * inv
    s2 = jnp.cross(dd, e1[None])
    b2 = (d[:, None, :] * s2).sum(-1) * inv
    t = (e2[None] * s2).sum(-1) * inv
    ok = (div != 0.0) & (b1 >= 0) & (b1 <= 1) & (b2 >= 0) & (b1 + b2 <= 1) & (t > 0)
    return jnp.where(ok, t, jnp.inf)


def trace_triangles(surf: SurfaceData, o, d, tmin, tmax):
    """Nearest mesh hit -> (t_hit (P,), normal (P,3)); inf/zero on miss."""
    p = o.shape[0]
    if surf.num_tris == 0:
        return jnp.full(p, jnp.inf, o.dtype), jnp.zeros((p, 3), o.dtype)
    t = _ray_triangles(o, d, surf.tri_v0, surf.tri_e1, surf.tri_e2)
    t = jnp.where((t >= tmin[:, None]) & (t <= tmax[:, None]), t, jnp.inf)
    k = jnp.argmin(t, axis=1)
    t_hit = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
    n = surf.tri_n[k]
    return t_hit, n


def _tri_chunk_bounds(v0, e1, e2):
    """Bounding sphere per triangle chunk; v0/e1/e2: (NC, C, 3).  Pad
    triangles carry |v0| >= 2e10 and zero edges."""
    ok = (jnp.abs(v0) < 2e10).all(-1)  # (NC, C)
    pts = jnp.concatenate([v0, v0 + e1, v0 + e2], axis=1)  # (NC, 3C, 3)
    m = jnp.concatenate([ok, ok, ok], axis=1)[..., None]
    big = jnp.float32(3e10)
    lo = jnp.min(jnp.where(m, pts, big), axis=1)
    hi = jnp.max(jnp.where(m, pts, -big), axis=1)
    ctr = 0.5 * (lo + hi)
    rad = 0.5 * jnp.linalg.norm(hi - lo, axis=-1)
    alive = ok.any(1)
    return (jnp.where(alive[:, None], ctr, 0.0),
            jnp.where(alive, rad, 0.0), alive)


def _trace_tri_blocks(chunks, cand, o_b, d_b, tmin_b, tmax_b):
    """Scan candidate triangle-chunk columns per ray block.
    chunks: (v0, e1, e2, n) of shape (NC1, C, 3); cand: (B, K)."""
    v0c, e1c, e2c, nrc = chunks

    def blk(v0, e1, e2, nrm, o, d, t0, t1):
        t = _ray_triangles(o, d, v0, e1, e2)
        t = jnp.where((t >= t0[:, None]) & (t <= t1[:, None]), t, jnp.inf)
        k = jnp.argmin(t, axis=1)
        return jnp.take_along_axis(t, k[:, None], 1)[:, 0], nrm[k]

    def step(carry, ids):
        bt, bn = carry
        ct, cn = jax.vmap(blk)(
            v0c[ids], e1c[ids], e2c[ids], nrc[ids],
            o_b, d_b, tmin_b, tmax_b,
        )
        win = ct < bt
        return (jnp.where(win, ct, bt),
                jnp.where(win[..., None], cn, bn)), None

    init = (jnp.full_like(o_b[..., 0], jnp.inf), jnp.zeros_like(o_b))
    (bt, bn), _ = jax.lax.scan(step, init, cand.T)
    return bt, bn


def trace_triangles_tiled(surf: SurfaceData, o, d, tmin, tmax, *,
                          group: int = 256, tri_chunk: int = 64,
                          max_chunks=(64, 256), screen=None):
    """Exact nearest mesh hit with the same two-level tile culling as
    :func:`trace_streamlines_tiled`: triangle chunks (bounding spheres;
    `SurfaceData.from_meshes` emits triangles in Morton centroid order
    so chunks are spatially tight) vs ray-block bounding cones, tiered
    candidate capacities under nested `lax.cond`, exact in every
    branch.  ``d`` must be unit vectors.  This is what lets the
    reference's triangle-heavy scenes (NASA landing gear) trace in
    bounded memory: the dense path materializes (P, T), impossible at
    1080p x 100k tris.  Reference: two-level mesh BVH,
    exa/OptixRenderer.cpp + programs/exabrick.cu:1475-1529."""
    p = o.shape[0]
    nt = surf.num_tris
    c = int(tri_chunk)
    nc = -(-nt // c)
    dead = jnp.float32(3e10)

    pad = nc * c - nt + c  # +1 trailing all-dead chunk for junk slots
    v0 = jnp.concatenate(
        [surf.tri_v0, jnp.full((pad, 3), dead, surf.tri_v0.dtype)]
    ).reshape(nc + 1, c, 3)
    zpad = jnp.zeros((pad, 3), surf.tri_e1.dtype)
    e1 = jnp.concatenate([surf.tri_e1, zpad]).reshape(nc + 1, c, 3)
    e2 = jnp.concatenate([surf.tri_e2, zpad]).reshape(nc + 1, c, 3)
    nr = jnp.concatenate([surf.tri_n, zpad]).reshape(nc + 1, c, 3)
    ctr, rad, alive = _tri_chunk_bounds(v0, e1, e2)

    o_b, d_b, tmin_b, tmax_b, inv, nb = _ray_blocks(
        o, d, tmin, tmax, group, screen
    )
    oc, rho, axis, cos_t, x_reach = _ray_block_cones(o_b, d_b, tmax_b)
    mask = _cone_sphere_overlap(
        oc, rho, axis, cos_t, x_reach, ctr, rad, alive
    )
    chunks = (v0, e1, e2, nr)
    bt, bn = _tiered_trace(
        mask, nc, nb, max_chunks,
        lambda cand: _trace_tri_blocks(
            chunks, cand, o_b, d_b, tmin_b, tmax_b
        ),
    )
    return _unblock(bt, bn, p, inv)


# ----------------------------------------------------------------------------
# streamline segments as rounded cones (exabrick.cu:440-573)
# ----------------------------------------------------------------------------

def _ray_rounded_cones(o, d, pa, pb, r):
    """Capsule (equal-radius rounded cone) intersection.
    o,d: (P,3); pa,pb: (S,3); r scalar.  Returns t (P,S) inf-miss and
    normals (P,S,3)."""
    # shift origin near the segment for numerical robustness
    ba = pb[None] - pa[None]  # (1,S,3)
    oa = o[:, None, :] - pa[None]
    baba = (ba * ba).sum(-1)
    bard = (ba * d[:, None, :]).sum(-1)
    baoa = (ba * oa).sum(-1)
    rdoa = (d[:, None, :] * oa).sum(-1)
    oaoa = (oa * oa).sum(-1)
    # cylinder body
    a = baba - bard * bard
    b = baba * rdoa - baoa * bard
    c = baba * oaoa - baoa * baoa - r * r * baba
    h = b * b - a * c
    a_safe = jnp.where(a == 0, 1.0, a)
    t_body = (-b - jnp.sqrt(jnp.maximum(h, 0.0))) / a_safe
    y = baoa + t_body * bard
    body_ok = (h >= 0) & (y > 0) & (y < baba) & (a != 0)

    # caps (spheres at both ends)
    def sphere(ctr):
        oc = o[:, None, :] - ctr[None]
        bq = (oc * d[:, None, :]).sum(-1)
        cq = (oc * oc).sum(-1) - r * r
        hq = bq * bq - cq
        tq = -bq - jnp.sqrt(jnp.maximum(hq, 0.0))
        return jnp.where(hq >= 0, tq, jnp.inf)

    t_a = sphere(pa)
    t_b = sphere(pb)
    t_body = jnp.where(body_ok, t_body, jnp.inf)
    t = jnp.minimum(t_body, jnp.minimum(t_a, t_b))
    t = jnp.where(t > 0, t, jnp.inf)

    hitp = o[:, None, :] + t[..., None] * d[:, None, :]
    yy = ((hitp - pa[None]) * ba).sum(-1) / jnp.where(baba == 0, 1.0, baba)
    yy = jnp.clip(yy, 0.0, 1.0)
    axis_pt = pa[None] + yy[..., None] * ba
    n = hitp - axis_pt
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return t, n


def _streamline_chunk(surf_chunk, current_timestep, o, d, tmin, tmax):
    seg_a, seg_b, seg_t, radius = surf_chunk
    t, n = _ray_rounded_cones(o, d, seg_a, seg_b, radius)
    visible = (seg_t < current_timestep)[None, :]
    dead = (jnp.abs(seg_a) >= 2e10).any(-1) | (
        jnp.abs(seg_b) >= 2e10
    ).any(-1)
    t = jnp.where(visible & ~dead[None, :], t, jnp.inf)
    t = jnp.where((t >= tmin[:, None]) & (t <= tmax[:, None]), t, jnp.inf)
    k = jnp.argmin(t, axis=1)
    rows = jnp.arange(t.shape[0])
    return t[rows, k], n[rows, k]


def trace_streamlines(surf: SurfaceData, current_timestep, o, d, tmin, tmax,
                      chunk: int = 2048):
    """Nearest visible streamline segment (segments at/after the current
    timestep are hidden, exabrick.cu:536-570).  ``d`` must be unit
    vectors (every production caller normalizes; the rounded-cone
    quadratics assume |d| = 1).

    Large trace tables (the live tracer holds seeds x timesteps
    segments) are processed in ``chunk``-segment slices under lax.scan
    with a running nearest-hit carry, so peak memory is P x chunk
    instead of P x S."""
    p = o.shape[0]
    s = surf.num_segments
    if s == 0:
        return jnp.full(p, jnp.inf, o.dtype), jnp.zeros((p, 3), o.dtype)
    if s <= chunk:
        return _streamline_chunk(
            (surf.seg_a, surf.seg_b, surf.seg_t, surf.seg_radius),
            current_timestep, o, d, tmin, tmax,
        )
    pad = (-s) % chunk
    seg_a = jnp.concatenate(
        [surf.seg_a, jnp.full((pad, 3), 3e10, surf.seg_a.dtype)]
    ).reshape(-1, chunk, 3)
    seg_b = jnp.concatenate(
        [surf.seg_b, jnp.full((pad, 3), 3e10, surf.seg_b.dtype)]
    ).reshape(-1, chunk, 3)
    seg_t = jnp.concatenate(
        [surf.seg_t, jnp.zeros(pad, surf.seg_t.dtype)]
    ).reshape(-1, chunk)

    def step(carry, xs):
        bt, bn = carry
        a, b, st = xs
        ct, cn = _streamline_chunk(
            (a, b, st, surf.seg_radius), current_timestep, o, d, tmin, tmax
        )
        win = ct < bt
        return (jnp.where(win, ct, bt),
                jnp.where(win[:, None], cn, bn)), None

    init = (jnp.full(p, jnp.inf, o.dtype), jnp.zeros((p, 3), o.dtype))
    (t_best, n_best), _ = jax.lax.scan(step, init, (seg_a, seg_b, seg_t))
    return t_best, n_best


# ----------------------------------------------------------------------------
# tile-culled streamline tracing (the live tracer's table is seeds x
# timesteps segments; seed-major order makes a run of consecutive
# segments one trajectory piece, so chunk bounding spheres are tight)
# ----------------------------------------------------------------------------

def _segment_chunk_bounds(sa, sb, radius):
    """Bounding sphere per segment chunk.  sa/sb: (NC, C, 3).  Dead
    endpoints (|coord| >= 2e10, the tracer's not-yet-advanced slots and
    the pad chunk) are excluded; an all-dead chunk reports alive=False.
    Returns centers (NC, 3), radii (NC,), alive (NC,)."""
    ok = (jnp.abs(sa) < 2e10).all(-1) & (jnp.abs(sb) < 2e10).all(-1)
    pts = jnp.concatenate([sa, sb], axis=1)
    m = jnp.concatenate([ok, ok], axis=1)[..., None]
    big = jnp.float32(3e10)
    lo = jnp.min(jnp.where(m, pts, big), axis=1)
    hi = jnp.max(jnp.where(m, pts, -big), axis=1)
    ctr = 0.5 * (lo + hi)
    rad = 0.5 * jnp.linalg.norm(hi - lo, axis=-1) + radius
    alive = ok.any(1)
    return (jnp.where(alive[:, None], ctr, 0.0),
            jnp.where(alive, rad, 0.0), alive)


def _ray_block_cones(o_b, d_b, tmax_b):
    """Bounding cone per ray block.  o_b/d_b: (B, G, 3).  Returns apex
    centroid (B, 3), apex radius (B,), unit axis (B, 3), cos half-angle
    (B,), and the block's largest reachable axis coordinate (B,)."""
    oc = o_b.mean(1)
    rho = jnp.linalg.norm(o_b - oc[:, None], axis=-1).max(1)
    axis = d_b.mean(1)
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-20
    )
    dn = jnp.linalg.norm(d_b, axis=-1)
    cos_t = jnp.clip(
        ((d_b * axis[:, None]).sum(-1)
         / jnp.maximum(dn, 1e-20)).min(1), -1.0, 1.0
    )
    # ray points sit at axis coordinate <= rho + t*|d| (t windows are in
    # the caller's |d| parametrization, so scale by the block max |d|)
    x_reach = rho + jnp.maximum(tmax_b.max(1), 0.0) * dn.max(1)
    return oc, rho, axis, cos_t, x_reach


def _cone_sphere_overlap(oc, rho, axis, cos_t, x_reach, ctr, rad, alive):
    """Conservative (never-drops) cone-vs-sphere test, (B, NC) mask.
    The plane term is the signed distance to a supporting halfspace of
    the cone, a lower bound on the true distance, so `<= rr` keeps
    every genuine overlap."""
    v = ctr[None] - oc[:, None, :]
    x = (v * axis[:, None, :]).sum(-1)
    vv = (v * v).sum(-1)
    y = jnp.sqrt(jnp.maximum(vv - x * x, 0.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    rr = rad[None] + rho[:, None]
    plane = cos_t[:, None] * y - sin_t[:, None] * x
    hit = (plane <= rr) | (vv <= rr * rr)
    # forward rays only: a sphere wholly behind the apex is unreachable,
    # and one past the farthest t window is too
    hit &= x + rad[None] >= -rho[:, None]
    hit &= x - rad[None] <= x_reach[:, None]
    # incoherent block (half-angle >= ~84 deg): the halfspace bound
    # degenerates, keep every chunk for this block
    hit = jnp.where(cos_t[:, None] < 0.1, True, hit)
    return hit & alive[None]


def _trace_stream_blocks(chunks, radius, cand, current_timestep,
                         o_b, d_b, tmin_b, tmax_b):
    """Scan candidate chunk columns; each block gathers its own chunk.
    chunks: (sa, sb, st) of shape (NC1, C, ...); cand: (B, K) chunk ids.
    Returns nearest t (B, G) and normals (B, G, 3)."""
    sa, sb, st = chunks

    def step(carry, ids):
        bt, bn = carry
        ct, cn = jax.vmap(
            lambda a, b, t_, o, d, t0, t1: _streamline_chunk(
                (a, b, t_, radius), current_timestep, o, d, t0, t1
            )
        )(sa[ids], sb[ids], st[ids], o_b, d_b, tmin_b, tmax_b)
        win = ct < bt
        return (jnp.where(win, ct, bt),
                jnp.where(win[..., None], cn, bn)), None

    # derive the carry init from o_b so its device-variance matches the
    # step output under shard_map (jnp.full would be unvarying)
    init = (jnp.full_like(o_b[..., 0], jnp.inf), jnp.zeros_like(o_b))
    (bt, bn), _ = jax.lax.scan(step, init, cand.T)
    return bt, bn


def _screen_tile_perm(w: int, h: int, group: int):
    """Row-major pixel order -> near-square screen-tile order, so a
    contiguous block of `group` rays is one tile's bundle (much tighter
    bounding cones than row strips).  Returns (perm, inverse)."""
    tw = max(8, int(2 ** np.round(np.log2(max(np.sqrt(group), 1)))))
    th = max(1, group // tw)
    py, px = np.mgrid[0:h, 0:w]
    tile = (py // th) * ((w + tw - 1) // tw) + px // tw
    perm = np.argsort(tile.ravel(), kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


def _ray_blocks(o, d, tmin, tmax, group: int, screen):
    """Group rays into blocks of `group` (screen-tiled when `screen`
    gives the row-major (w, h) shape).  Returns blocked arrays, the
    inverse permutation (or None), and the block count."""
    p = o.shape[0]
    g = int(group)
    perm = inv = None
    if screen is not None and int(screen[0]) * int(screen[1]) == p:
        perm, inv = _screen_tile_perm(int(screen[0]), int(screen[1]), g)
    nb = -(-p // g)
    idx = np.minimum(np.arange(nb * g), p - 1)
    if perm is not None:
        idx = np.concatenate([perm, np.full(nb * g - p, perm[-1])])
    idx = jnp.asarray(idx, jnp.int32)
    return (o[idx].reshape(nb, g, 3), d[idx].reshape(nb, g, 3),
            tmin[idx].reshape(nb, g), tmax[idx].reshape(nb, g), inv, nb)


def _tiered_trace(mask, nc: int, nb: int, max_chunks, scan_fn):
    """Run `scan_fn(cand)` with per-block candidate chunk ids padded to
    the smallest adequate capacity tier (junk slots point at the dead
    pad chunk `nc`); nested lax.cond on the per-frame max count, with a
    scan over every chunk as the exact innermost fallback."""
    counts = mask.sum(1)
    cmax = counts.max()
    if isinstance(max_chunks, int):
        max_chunks = (max_chunks,)
    tiers = sorted({min(int(k), nc) for k in max_chunks if int(k) < nc})
    if tiers:
        order = jnp.argsort(~mask, axis=1)

    def _run(kc):
        cand = order[:, :kc]
        cand = jnp.where(
            jnp.arange(kc)[None] < counts[:, None], cand, nc
        )
        return lambda: scan_fn(cand)

    run = lambda: scan_fn(  # noqa: E731
        jnp.broadcast_to(jnp.arange(nc), (nb, nc))
    )
    for kc in reversed(tiers):
        run = (lambda kc=kc, nxt=run: lambda: jax.lax.cond(
            cmax <= kc, _run(kc), nxt
        ))()
    return run()


def _unblock(bt, bn, p: int, inv):
    t = bt.reshape(-1)[:p]
    n = bn.reshape(-1, 3)[:p]
    if inv is not None:
        inv = jnp.asarray(inv)
        t = t[inv]
        n = n[inv]
    return t, n


def trace_streamlines_tiled(surf: SurfaceData, current_timestep, o, d,
                            tmin, tmax, *, group: int = 256,
                            seg_chunk: int = 32, max_chunks=(64, 256),
                            screen=None):
    """Exact nearest streamline hit with two-level culling: segment
    chunks (bounding spheres; the tracer's Morton seed order keeps them
    tight) vs ray blocks (bounding cones).  Each block tests only its
    overlapping chunks, padded to the smallest adequate capacity tier
    in `max_chunks`; when even the largest tier overflows, the call
    scans every chunk (still blocked, still exact).  Tier selection is
    a nested `lax.cond` on the per-frame max candidate count, so the
    result equals :func:`trace_streamlines` in every branch (to within
    XLA's per-shape FMA contraction, ~1 ulp) while the common
    localized-tracer case pays only the small tier.  ``d`` must be unit vectors (the rounded-cone quadratics
    assume |d| = 1; every production caller normalizes).

    This is the TPU-first replacement for the reference's per-frame
    streamline BVH rebuild (exa/OptixRenderer.cpp:476-487): culling is
    recomputed in-graph each frame from the fixed-shape segment table,
    so the live tracer never recompiles or rebuilds host-side.

    `screen=(w, h)`: optional row-major screen shape of the ray batch;
    rays are regrouped into near-square tiles for tighter cones."""
    p = o.shape[0]
    s = surf.num_segments
    radius = surf.seg_radius
    c = int(seg_chunk)
    nc = -(-s // c)
    dead = jnp.float32(3e10)

    def _pad3(xs, rows):
        return jnp.concatenate(
            [xs, jnp.full((rows, 3), dead, xs.dtype)]
        )

    # +1 trailing all-dead chunk: junk candidate slots point here
    sa = _pad3(surf.seg_a, nc * c - s + c).reshape(nc + 1, c, 3)
    sb = _pad3(surf.seg_b, nc * c - s + c).reshape(nc + 1, c, 3)
    st = jnp.concatenate(
        [surf.seg_t, jnp.zeros(nc * c - s + c, surf.seg_t.dtype)]
    ).reshape(nc + 1, c)
    ctr, rad, alive = _segment_chunk_bounds(sa, sb, radius)

    o_b, d_b, tmin_b, tmax_b, inv, nb = _ray_blocks(
        o, d, tmin, tmax, group, screen
    )
    oc, rho, axis, cos_t, x_reach = _ray_block_cones(o_b, d_b, tmax_b)
    mask = _cone_sphere_overlap(
        oc, rho, axis, cos_t, x_reach, ctr, rad, alive
    )
    chunks = (sa, sb, st)
    bt, bn = _tiered_trace(
        mask, nc, nb, max_chunks,
        lambda cand: _trace_stream_blocks(
            chunks, radius, cand, current_timestep,
            o_b, d_b, tmin_b, tmax_b,
        ),
    )
    return _unblock(bt, bn, p, inv)


# ----------------------------------------------------------------------------
# contour planes (exabrick.cu:1267-1406)
# ----------------------------------------------------------------------------

def trace_contour_planes(scene, fs, cfg, o, d, tmin, tmax):
    """Nearest enabled contour plane hit within the world-space bounds box.

    The reference clips the plane against the bounds box and intersects
    the resulting polygon; an axis-aligned-box-clipped plane hit is
    equivalent to: ray-plane hit point inside the box.
    """
    from .dvr import locate_leaf

    p = o.shape[0]
    t_best = jnp.full(p, jnp.inf, o.dtype)
    color = jnp.zeros((p, 3), o.dtype)
    normal = jnp.zeros((p, 3), o.dtype)
    w_lo = scene.world_bounds_lo
    w_hi = scene.world_bounds_hi
    span = w_hi - w_lo

    for i in range(fs.contour_enabled.shape[0]):
        n = fs.contour_normal[i]
        # offset is expressed in the unit cube scaled to world bounds
        # (exabrick.cu:1356-1362): plane dot(n, (p - lo)/span) = offset
        denom = (n * d).sum(-1)
        # plane in world space: dot(n/span', p) = offset + dot(n, lo/span)
        ns = n / span
        off = fs.contour_offset[i] + (ns * w_lo).sum()
        t = (off - (ns * o).sum(-1)) / jnp.where(denom == 0, 1.0, (ns * d).sum(-1))
        hitp = o + t[:, None] * d
        inside = ((hitp >= w_lo) & (hitp <= w_hi)).all(-1)
        ok = (
            fs.contour_enabled[i]
            & ((ns * d).sum(-1) != 0)
            & inside
            & (t >= tmin)
            & (t <= tmax)
            & (t < t_best)
        )
        # sample the field at the hit to colormap the plane
        # (samplePointWithInfRay, exabrick.cu:818-830: value used whether or
        # not the sample is valid, matching the reference)
        m = scene.voxel_from_world
        pv = hitp @ m[:, :3].T + m[:, 3]
        node = locate_leaf(scene, pv)
        rid = scene.tree_leaf[node]
        c = jnp.clip(fs.contour_channel[i], 0, cfg.num_channels - 1)
        _, val = _sample_channel(scene, cfg, jnp.clip(rid, 0, None), pv, c)
        rgba = _lookup_channel(fs, cfg, c, val)
        t_best = jnp.where(ok, t, t_best)
        color = jnp.where(ok[:, None], rgba[:, :3], color)
        normal = jnp.where(ok[:, None], n[None], normal)
    return t_best, color, normal


def _sample_channel(scene, cfg, rid, pos, channel):
    """sample_basis with a *traced* channel index via lax.switch."""
    from .dvr import sample_basis

    if cfg.num_channels == 1:
        return sample_basis(scene, rid, pos, 0)
    return jax.lax.switch(
        channel,
        [lambda r, p, c=c: sample_basis(scene, r, p, c)
         for c in range(cfg.num_channels)],
        rid, pos,
    )


def _lookup_channel(fs, cfg, channel, value):
    if cfg.num_channels == 1:
        return lookup_xf(fs.xf_lut[0], fs.xf_domain[0], fs.xf_opacity_scale, value)
    return jax.lax.switch(
        channel,
        [lambda v, c=c: lookup_xf(fs.xf_lut[c], fs.xf_domain[c],
                                  fs.xf_opacity_scale, v)
         for c in range(cfg.num_channels)],
        value,
    )


# ----------------------------------------------------------------------------
# combined surface pass + shading + AO
# ----------------------------------------------------------------------------

def _nearest_surface(scene, fs, surf, cfg, o, d, tmin, tmax,
                     include_contours: bool, include_iso: bool,
                     current_timestep=None, screen=None):
    """traceSurfaces: nearest hit among meshes, contour planes, streamlines
    and iso surfaces.  Returns (t, normal, base_color, ambient, kind)."""
    p = o.shape[0]
    t = jnp.full(p, jnp.inf, o.dtype)
    normal = jnp.zeros((p, 3), o.dtype)
    base = jnp.zeros((p, 3), o.dtype)
    ambient = jnp.zeros(p, o.dtype)
    kind = jnp.full(p, -1, jnp.int32)

    if surf.num_tris >= 4096 and o.shape[0] >= 2048:
        tt, tn = trace_triangles_tiled(surf, o, d, tmin, tmax,
                                       screen=screen)
    else:
        tt, tn = trace_triangles(surf, o, d, tmin, tmax)
    win = tt < t
    t = jnp.where(win, tt, t)
    normal = jnp.where(win[:, None], tn, normal)
    base = jnp.where(win[:, None], 0.8, base)
    ambient = jnp.where(win, 0.2, ambient)
    kind = jnp.where(win, 0, kind)

    if include_contours:
        ct, cc, cn = trace_contour_planes(scene, fs, cfg, o, d, tmin, tmax)
        win = ct < t
        t = jnp.where(win, ct, t)
        normal = jnp.where(win[:, None], cn, normal)
        base = jnp.where(win[:, None], cc, base)
        ambient = jnp.where(win, 0.0, ambient)
        kind = jnp.where(win, PRIMID_PLANE, kind)

    if surf.num_segments > 0:
        # default: every segment visible (a live tracer animates by
        # passing its current timestep)
        ts = current_timestep if current_timestep is not None else jnp.int32(1 << 30)
        if surf.num_segments >= 2048 and o.shape[0] >= 2048:
            st, sn = trace_streamlines_tiled(
                surf, ts, o, d, tmin, tmax, screen=screen
            )
        else:
            st, sn = trace_streamlines(surf, ts, o, d, tmin, tmax)
        win = st < t
        t = jnp.where(win, st, t)
        normal = jnp.where(win[:, None], sn, normal)
        base = jnp.where(win[:, None], jnp.asarray([0.8, 0.2, 0.1]), base)
        ambient = jnp.where(win, 0.2, ambient)
        kind = jnp.where(win, PRIMID_STREAMLINE, kind)

    if include_iso and cfg.iso_surfaces:
        from .iso import trace_iso_rays

        it, in_, ic = trace_iso_rays(scene, fs, cfg, o, d, tmin, tmax)
        win = it < t
        t = jnp.where(win, it, t)
        normal = jnp.where(win[:, None], in_, normal)
        base = jnp.where(win[:, None], ic, base)
        ambient = jnp.where(win, 0.0, ambient)
        kind = jnp.where(win, PRIMID_ISOSURFACE, kind)

    return t, normal, base, ambient, kind


def _onb(w):
    """make_orthonormal_basis (exabrick.cu:78-83), batched."""
    cond = (jnp.abs(w[:, 0]) > jnp.abs(w[:, 1]))[:, None]
    v1 = jnp.stack([-w[:, 2], jnp.zeros_like(w[:, 0]), w[:, 0]], -1)
    v2 = jnp.stack([jnp.zeros_like(w[:, 0]), w[:, 2], -w[:, 1]], -1)
    v = jnp.where(cond, v1, v2)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
    u = jnp.cross(v, w)
    return u, v


def trace_surface_pass(scene, fs, surf, cfg, o, d, key,
                       include_iso: bool = True,
                       include_contours: bool = True,
                       screen=None):
    """Full surface pass of the raygen program: nearest surface, AO,
    shaded background color.  Returns (t_hit (P,), bg (P,3)).

    ``include_iso=False`` leaves implicit iso surfaces to the caller (the
    slab fast path renders them with its own sweep)."""
    p = o.shape[0]
    tmin = jnp.full(p, 1e-6, o.dtype)
    tmax = jnp.full(p, 2e10, o.dtype)

    t, n, base, ambient, kind = _nearest_surface(
        scene, fs, surf, cfg, o, d, tmin, tmax, screen=screen,
        include_contours=include_contours, include_iso=include_iso,
        current_timestep=getattr(fs, "tracer_timestep", None),
    )
    hit = jnp.isfinite(t)
    has_n = jnp.linalg.norm(n, axis=-1) > 0.0

    # AO: 2 cosine-weighted hemisphere samples against everything but the
    # contour planes (exabrick.cu:1612-1645)
    shadow = jnp.zeros(p, o.dtype)
    if cfg.ao_samples > 0:
        isect = o + t[:, None] * d
        isect = jnp.where(hit[:, None], isect, o)
        u, v = _onb(n)
        hits = jnp.zeros(p, o.dtype)
        for s in range(cfg.ao_samples):
            r = jax.random.uniform(jax.random.fold_in(key, s), (p, 2))
            rr = jnp.sqrt(r[:, 0])
            theta = 2.0 * jnp.pi * r[:, 1]
            sp = jnp.stack(
                [rr * jnp.cos(theta), rr * jnp.sin(theta),
                 jnp.sqrt(1.0 - r[:, 0])], -1,
            )
            dir_ = sp[:, 0:1] * u + sp[:, 1:2] * v + sp[:, 2:3] * n
            dir_ = dir_ / jnp.maximum(
                jnp.linalg.norm(dir_, axis=-1, keepdims=True), 1e-20
            )
            at, *_ = _nearest_surface(
                scene, fs, surf, cfg, isect, dir_,
                jnp.full(p, 1e-4, o.dtype),
                jnp.full(p, 1.0, o.dtype) * fs.ao_length,
                include_contours=False, include_iso=cfg.iso_surfaces,
            )
            hits = hits + jnp.isfinite(at)
        shadow = jnp.where(fs.ao_enabled, hits / cfg.ao_samples, 0.0)

    shaded = ambient[:, None] + base * (
        jnp.abs((d * n).sum(-1)) * (1.0 - shadow)
    )[:, None]
    bg = jnp.where(
        hit[:, None],
        jnp.where(has_n[:, None], shaded, base),
        0.0,
    )
    return jnp.where(hit, t, 2e10), bg
