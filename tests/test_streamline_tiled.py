"""Tile-culled streamline tracing equals the dense scan exactly.

The tiled tracer (render/surfaces.py:trace_streamlines_tiled) culls
segment chunks per ray block with conservative cone-vs-sphere tests and
falls back to scanning every chunk when a block overflows its candidate
capacity — both branches must reproduce trace_streamlines bit-for-bit.
Reference behavior: per-frame streamline BVH traversal,
exa/OptixRenderer.cpp:476-487 + programs/exabrick.cu:440-573."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlexabrick_tpu.render.surfaces import (
    SurfaceData,
    trace_streamlines,
    trace_streamlines_tiled,
)

W, H = 64, 48


def _tracer_surface(n_seeds=96, n_steps=50, seed=0, dead_tail=0):
    """Seed-major segment table shaped like Tracer.surface_data_full:
    short smooth trajectories from seeds spread over the domain (each
    trajectory stays local, like advected particles); optionally the
    last `dead_tail` steps of every trajectory carry dead endpoints."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-25, 25, (n_seeds, 3)).astype(np.float32)
    vel = 0.25 * rng.normal(0, 1, (n_seeds, 3)).astype(np.float32)
    pts = [pos.copy()]
    for _ in range(n_steps):
        vel += 0.08 * rng.normal(0, 1, (n_seeds, 3)).astype(np.float32)
        vel *= 0.9
        pos = pos + vel
        pts.append(pos.copy())
    traj = np.stack(pts, axis=1)  # (seeds, steps+1, 3)
    from owlexabrick_tpu.render.tracer import morton_order

    traj = traj[morton_order(traj[:, 0])]  # Tracer's emission order
    if dead_tail:
        traj[:, -dead_tail:] = 2.5e10
    a = traj[:, :-1].reshape(-1, 3)
    b = traj[:, 1:].reshape(-1, 3)
    seg_t = np.tile(np.arange(1, n_steps + 1, dtype=np.int32),
                    (n_seeds, 1)).reshape(-1)
    z = np.zeros((0, 3), np.float32)
    return SurfaceData(
        tri_v0=z, tri_e1=z, tri_e2=z, tri_n=z,
        seg_a=a, seg_b=b, seg_t=seg_t, seg_radius=np.float32(1.5),
    )


def _camera_rays(w=W, h=H, seed=1):
    rng = np.random.default_rng(seed)
    o0 = np.array([70.0, 45.0, 80.0], np.float32)
    fwd = -o0 / np.linalg.norm(o0)
    up = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    vup = np.cross(right, fwd)
    i = (np.arange(w) + 0.5) / w - 0.5
    j = (np.arange(h) + 0.5) / h - 0.5
    d = (fwd[None, None]
         + 0.9 * i[None, :, None] * right[None, None]
         + 0.7 * j[:, None, None] * vup[None, None]).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)  # unit-d contract
    o = np.broadcast_to(o0, d.shape).copy()
    o += rng.normal(0, 1e-3, o.shape).astype(np.float32)
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))


def _both(surf, ts, o, d, tmin, tmax, **kw):
    td, nd = jax.jit(trace_streamlines)(surf, ts, o, d, tmin, tmax)
    tt, nt = jax.jit(
        lambda *a: trace_streamlines_tiled(*a, **kw)
    )(surf, ts, o, d, tmin, tmax)
    return map(np.asarray, (td, nd, tt, nt))


def _assert_equal(td, nd, tt, nt):
    # XLA fuses mul+add into FMA differently per partition shape, so
    # agreement is ulp-level, not bitwise (observed max 1.5e-6 rel)
    np.testing.assert_array_equal(np.isfinite(td), np.isfinite(tt))
    hit = np.isfinite(td)
    np.testing.assert_allclose(tt[hit], td[hit], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(nt[hit], nd[hit], rtol=1e-4, atol=1e-4)


def test_tiled_equals_dense_camera_rays():
    surf = _tracer_surface()
    o, d = _camera_rays()
    p = o.shape[0]
    tmin = jnp.full(p, 1e-6, jnp.float32)
    tmax = jnp.full(p, 2e10, jnp.float32)
    ts = jnp.int32(1 << 30)
    td, nd, tt, nt = _both(surf, ts, o, d, tmin, tmax, screen=(W, H))
    assert np.isfinite(td).any(), "fixture must produce hits"
    assert (~np.isfinite(td)).any(), "fixture must produce misses"
    _assert_equal(td, nd, tt, nt)


def test_tiled_equals_dense_timestep_and_dead():
    # live-viewer table: dead tail + timestep culling mid-advect
    surf = _tracer_surface(dead_tail=20, seed=3)
    o, d = _camera_rays(seed=4)
    p = o.shape[0]
    tmin = jnp.full(p, 1e-6, jnp.float32)
    tmax = jnp.full(p, 2e10, jnp.float32)
    ts = jnp.int32(25)
    td, nd, tt, nt = _both(surf, ts, o, d, tmin, tmax, screen=(W, H))
    assert np.isfinite(td).any()
    _assert_equal(td, nd, tt, nt)


def test_tiled_overflow_fallback_exact():
    # capacity 1 forces the lax.cond dense branch
    surf = _tracer_surface(seed=5)
    o, d = _camera_rays(seed=6)
    p = o.shape[0]
    tmin = jnp.full(p, 1e-6, jnp.float32)
    tmax = jnp.full(p, 2e10, jnp.float32)
    ts = jnp.int32(1 << 30)
    td, nd, tt, nt = _both(
        surf, ts, o, d, tmin, tmax, max_chunks=1, screen=(W, H)
    )
    _assert_equal(td, nd, tt, nt)


def test_tiled_incoherent_rays_exact():
    # random directions break every block cone: the wide-angle guard +
    # fallback must keep exactness
    surf = _tracer_surface(seed=7)
    rng = np.random.default_rng(8)
    p = 2048
    o = jnp.asarray(rng.uniform(-40, 40, (p, 3)), jnp.float32)
    d = rng.normal(size=(p, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    tmin = jnp.full(p, 1e-6, jnp.float32)
    tmax = jnp.full(p, 60.0, jnp.float32)
    ts = jnp.int32(1 << 30)
    td, nd, tt, nt = _both(surf, ts, o, d, tmin, tmax)
    assert np.isfinite(td).any()
    _assert_equal(td, nd, tt, nt)


def test_tiled_culling_engages():
    # the clustered fixture must actually cull (not always fall back):
    # at viewer-like resolution the small capacity tier must suffice
    # and the mean block must see a small fraction of the chunks
    from owlexabrick_tpu.render.surfaces import (
        _cone_sphere_overlap,
        _ray_block_cones,
        _screen_tile_perm,
        _segment_chunk_bounds,
    )

    w, h = 128, 96
    surf = _tracer_surface()
    o, d = _camera_rays(w, h)
    p = o.shape[0]
    c, g = 32, 256  # trace_streamlines_tiled defaults
    s = surf.num_segments
    nc = -(-s // c)
    pad = nc * c - s
    sa = jnp.concatenate(
        [jnp.asarray(surf.seg_a), jnp.full((pad, 3), 3e10)]
    ).reshape(nc, c, 3)
    sb = jnp.concatenate(
        [jnp.asarray(surf.seg_b), jnp.full((pad, 3), 3e10)]
    ).reshape(nc, c, 3)
    ctr, rad, alive = _segment_chunk_bounds(sa, sb, surf.seg_radius)
    perm, _ = _screen_tile_perm(w, h, g)
    nb = -(-p // g)
    idx = np.concatenate([perm, np.full(nb * g - p, perm[-1])])
    o_b = jnp.asarray(o)[idx].reshape(nb, g, 3)
    d_b = jnp.asarray(d)[idx].reshape(nb, g, 3)
    tmax_b = jnp.full((nb, g), 2e10, jnp.float32)
    cones = _ray_block_cones(o_b, d_b, tmax_b)
    mask = np.asarray(_cone_sphere_overlap(*cones, ctr, rad, alive))
    counts = mask.sum(1)
    # measured 2026-08: mean 19 / max 56 of 150 chunks
    assert counts.max() <= 64, counts.max()
    assert counts.mean() < 0.25 * nc, (counts.mean(), nc)


# ----------------------------------------------------------------------------
# tiled triangle tracing (same culling machinery, mesh chunks)
# ----------------------------------------------------------------------------

def _big_mesh(nu=72, nv=72, seed=0):
    """Bumpy-sphere triangle mesh (> 4096 tris, the tiled-path
    threshold), built through SurfaceData.from_meshes so triangles get
    the Morton centroid order."""
    from owlexabrick_tpu.core.types import TriangleMesh

    rng = np.random.default_rng(seed)
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(1e-3, np.pi - 1e-3, nv)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    r = 14.0 + 2.0 * np.sin(3 * uu) * np.sin(4 * vv)
    x = r * np.sin(vv) * np.cos(uu)
    y = r * np.cos(vv)
    zc = r * np.sin(vv) * np.sin(uu)
    verts = np.stack([x, y, zc], -1).reshape(-1, 3).astype(np.float32)
    verts += rng.normal(0, 0.05, verts.shape).astype(np.float32)
    idx = []
    for i in range(nu):
        for j in range(nv - 1):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            idx.append([a, b, a + 1])
            idx.append([b, b + 1, a + 1])
    mesh = TriangleMesh(vertices=verts,
                        indices=np.asarray(idx, np.int32))
    return SurfaceData.from_meshes([mesh])


def _both_tri(surf, o, d, tmin, tmax, **kw):
    from owlexabrick_tpu.render.surfaces import (
        trace_triangles,
        trace_triangles_tiled,
    )

    td, nd = jax.jit(trace_triangles)(surf, o, d, tmin, tmax)
    tt, nt = jax.jit(
        lambda *a: trace_triangles_tiled(*a, **kw)
    )(surf, o, d, tmin, tmax)
    return map(np.asarray, (td, nd, tt, nt))


def test_tri_tiled_equals_dense():
    surf = _big_mesh()
    assert surf.num_tris >= 4096
    o, d = _camera_rays()
    p = o.shape[0]
    tmin = jnp.full(p, 1e-6, jnp.float32)
    tmax = jnp.full(p, 2e10, jnp.float32)
    td, nd, tt, nt = _both_tri(surf, o, d, tmin, tmax, screen=(W, H))
    assert np.isfinite(td).any() and (~np.isfinite(td)).any()
    _assert_equal(td, nd, tt, nt)


def test_tri_tiled_overflow_fallback_exact():
    surf = _big_mesh(seed=2)
    o, d = _camera_rays(seed=3)
    p = o.shape[0]
    tmin = jnp.full(p, 1e-6, jnp.float32)
    tmax = jnp.full(p, 2e10, jnp.float32)
    td, nd, tt, nt = _both_tri(
        surf, o, d, tmin, tmax, max_chunks=1, screen=(W, H)
    )
    _assert_equal(td, nd, tt, nt)


def test_tri_tiled_culling_engages():
    from owlexabrick_tpu.render.surfaces import (
        _cone_sphere_overlap,
        _ray_block_cones,
        _ray_blocks,
        _tri_chunk_bounds,
    )

    w, h = 128, 96
    surf = _big_mesh()
    o, d = _camera_rays(w, h)
    p = o.shape[0]
    c, g = 64, 256
    nt = surf.num_tris
    nc = -(-nt // c)
    pad = nc * c - nt
    v0 = jnp.concatenate(
        [jnp.asarray(surf.tri_v0), jnp.full((pad, 3), 3e10)]
    ).reshape(nc, c, 3)
    zp = jnp.zeros((pad, 3), jnp.float32)
    e1 = jnp.concatenate([jnp.asarray(surf.tri_e1), zp]).reshape(nc, c, 3)
    e2 = jnp.concatenate([jnp.asarray(surf.tri_e2), zp]).reshape(nc, c, 3)
    ctr, rad, alive = _tri_chunk_bounds(v0, e1, e2)
    o_b, d_b, tmin_b, tmax_b, inv, nb = _ray_blocks(
        jnp.asarray(o), jnp.asarray(d),
        jnp.full(p, 1e-6, jnp.float32), jnp.full(p, 2e10, jnp.float32),
        g, (w, h),
    )
    cones = _ray_block_cones(o_b, d_b, tmax_b)
    mask = np.asarray(_cone_sphere_overlap(*cones, ctr, rad, alive))
    counts = mask.sum(1)
    # Morton chunks on a closed surface: each tile sees a small slice
    assert counts.mean() < 0.35 * nc, (counts.mean(), nc)
