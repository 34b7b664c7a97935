"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlexabrick_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_renderer,
    replicate,
    shard_rays,
)
from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render.camera import Camera
from owlexabrick_tpu.render.dvr import RenderConfig, trace_dvr, composite_background
from owlexabrick_tpu.render.frame import make_frame_state
from owlexabrick_tpu.render.scene import to_device
from owlexabrick_tpu.render.surfaces import SurfaceData, trace_surface_pass

from conftest import EX2


@pytest.fixture(scope="module")
def setup(request):
    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(EX2)
    scene, *_ = scene_from_cells(lower, level, [scal])
    size = 16
    cam = Camera.look_at([12.0, 10.0, 14.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         50.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7)
    o, d = cam.rays(size, size)
    return scene, fs, o, d


@pytest.mark.slow
def test_8way_pixel_sharding_matches_single(setup):
    scene, fs, o, d = setup
    assert len(jax.devices()) >= 8
    cfg = RenderConfig(num_channels=1)
    mesh = make_mesh(8, 1)
    f = make_sharded_renderer(mesh, cfg)
    surf = SurfaceData.empty()
    sc = replicate(mesh, to_device(scene))
    fsr = replicate(mesh, fs)
    sfr = replicate(mesh, surf)
    key = jax.random.PRNGKey(7)
    os_, ds_ = shard_rays(mesh, o, d)
    sharded = np.asarray(f(sc, fsr, sfr, os_, ds_, key))

    # single-device reference with the same per-tile RNG layout
    per = o.shape[0] // 8
    single = np.zeros((o.shape[0], 3), np.float32)
    dscene = to_device(scene)
    fs = jax.tree.map(jnp.asarray, fs)
    for tile in range(8):
        k = jax.random.fold_in(jax.random.fold_in(key, 0), tile)
        sl = slice(tile * per, (tile + 1) * per)
        off = jax.random.uniform(jax.random.fold_in(k, 2), (per,))
        t_hit, bg = trace_surface_pass(
            dscene, fs, surf, cfg, jnp.asarray(o[sl]), jnp.asarray(d[sl]),
            jax.random.fold_in(k, 3),
        )
        rgba = trace_dvr(
            dscene, fs, cfg, jnp.asarray(o[sl]), jnp.asarray(d[sl]), off,
            t_end_world=t_hit,
        )
        single[sl] = np.asarray(composite_background(rgba, bg))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_4x2_px_spp_mesh(setup):
    scene, fs, o, d = setup
    cfg = RenderConfig(num_channels=1)
    mesh = make_mesh(4, 2)
    f = make_sharded_renderer(mesh, cfg)
    surf = SurfaceData.empty()
    sc = replicate(mesh, to_device(scene))
    out = np.asarray(
        f(sc, replicate(mesh, fs), replicate(mesh, surf),
          *shard_rays(mesh, o, d), jax.random.PRNGKey(1))
    )
    assert out.shape == (o.shape[0], 3)
    assert np.isfinite(out).all()
    assert out.max() > 0


def test_sharded_slab_render_matches_single(setup):
    """8-way pixel-band sharding of the slab fast path must reproduce the
    single-device sweep exactly (jitter off)."""
    import dataclasses

    from owlexabrick_tpu.parallel.mesh import make_sharded_slab_renderer
    from owlexabrick_tpu.render.slabs import (
        SlabConfig,
        build_level_grids,
        permute_camera,
        render_slabs,
    )
    from owlexabrick_tpu.builder.bricker import build_bricks
    from owlexabrick_tpu.pipeline import bricks_from_build
    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(EX2)
    res = build_bricks(lower, level)
    bricks, ids = bricks_from_build(res)

    size = 16
    cam = Camera.look_at([4.0, 4.0, 30.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, size, size)
    # Paraview Cool Warm compresses to sparse PWL knots (Jet's embedded
    # strip is too dithered and falls back to the dense loop)
    fs = jax.tree.map(
        jnp.asarray,
        make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.3,
                         colormap="Paraview Cool Warm"),
    )
    from owlexabrick_tpu.render.scene import to_device as _td  # noqa

    scene2, *_ = __import__(
        "owlexabrick_tpu.pipeline", fromlist=["scene_from_cells"]
    ).scene_from_cells(lower, level, [scal])
    grids = build_level_grids(bricks, scene2.scalars, axis=2)

    cfg = SlabConfig(nslabs=64, chunk=8, flip=True)
    mesh = make_mesh(8, 1)
    f = make_sharded_slab_renderer(mesh, cfg, size, size, jitter=False)
    pos, dir00, du, dv = permute_camera(cam, 2)
    from owlexabrick_tpu.parallel.mesh import replicate

    out = np.asarray(
        f(replicate(mesh, grids), replicate(mesh, fs),
          jnp.asarray(pos), jnp.asarray(dir00), jnp.asarray(du),
          jnp.asarray(dv), jax.random.PRNGKey(0))
    )
    single = np.asarray(
        jax.jit(render_slabs, static_argnames=("cfg", "width", "height"))(
            grids, fs, cfg, pos, dir00, du, dv, size, size
        )
    )
    np.testing.assert_allclose(out, single, rtol=1e-5, atol=1e-6)

    # with host-compressed TF knots passed through the sharded path
    from owlexabrick_tpu.render.slabs import compress_pwl

    lut = np.asarray(fs.xf_lut[0])
    kn = compress_pwl([np.concatenate(
        [lut[:, :3], lut[:, 3:4] * float(fs.xf_opacity_scale)], axis=1
    )])
    assert kn is not None
    out_k = np.asarray(
        f(replicate(mesh, grids), replicate(mesh, fs),
          jnp.asarray(pos), jnp.asarray(dir00), jnp.asarray(du),
          jnp.asarray(dv), jax.random.PRNGKey(0),
          jax.tree.map(jnp.asarray, kn))
    )
    # knots may come from the sub-quantum greedy fit (embedded palette
    # strips): compare against the single-device render using the SAME
    # knots for a tight check
    single_k = np.asarray(
        jax.jit(render_slabs, static_argnames=("cfg", "width", "height"))(
            grids, fs, cfg, pos, dir00, du, dv, size, size, knots=kn
        )
    )
    np.testing.assert_allclose(out_k, single_k, rtol=1e-5, atol=2e-5)


@pytest.mark.slow
def test_8way_multichannel_streamlines_matches_single():
    """BASELINE 'runnable config': multi-channel + streamlines sharded
    across the mesh.  Segment table large enough (>= 2048) that each
    shard's surface pass runs the tile-culled tracer."""
    from owlexabrick_tpu.render.tracer import morton_order
    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(EX2)
    scene, *_ = scene_from_cells(
        lower, level, [scal, 7.0 - scal], num_range_channels=2
    )
    w, h = 144, 128
    cam = Camera.look_at([12.0, 10.0, 14.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         50.0, w, h)
    fs = make_frame_state(
        cam, num_channels=2, xf_domains=[[0.0, 7.0], [0.0, 7.0]], dt=0.7
    )
    o, d = cam.rays(w, h)

    # clustered trajectories near the volume, Morton seed order
    rng = np.random.default_rng(11)
    n_seeds, n_steps = 64, 33
    pos = rng.uniform(0, 8, (n_seeds, 3)).astype(np.float32)
    vel = 0.1 * rng.normal(0, 1, (n_seeds, 3)).astype(np.float32)
    pts = [pos.copy()]
    for _ in range(n_steps):
        vel = 0.9 * vel + 0.03 * rng.normal(
            0, 1, (n_seeds, 3)
        ).astype(np.float32)
        pos = pos + vel
        pts.append(pos.copy())
    traj = np.stack(pts, axis=1)
    traj = traj[morton_order(traj[:, 0])]
    z = np.zeros((0, 3), np.float32)
    surf = SurfaceData(
        tri_v0=z, tri_e1=z, tri_e2=z, tri_n=z,
        seg_a=traj[:, :-1].reshape(-1, 3),
        seg_b=traj[:, 1:].reshape(-1, 3),
        seg_t=np.tile(np.arange(1, n_steps + 1, dtype=np.int32),
                      (n_seeds, 1)).reshape(-1),
        seg_radius=np.float32(0.35),
    )
    assert surf.num_segments >= 2048  # tiled-path threshold

    cfg = RenderConfig(num_channels=2)
    mesh = make_mesh(8, 1)
    f = make_sharded_renderer(mesh, cfg)
    sc = replicate(mesh, to_device(scene))
    fsr = replicate(mesh, fs)
    sfr = replicate(mesh, jax.tree.map(jnp.asarray, surf))
    key = jax.random.PRNGKey(3)
    os_, ds_ = shard_rays(mesh, o, d)
    sharded = np.asarray(f(sc, fsr, sfr, os_, ds_, key))

    per = o.shape[0] // 8
    single = np.zeros((o.shape[0], 3), np.float32)
    dscene = to_device(scene)
    fsj = jax.tree.map(jnp.asarray, fs)
    surfj = jax.tree.map(jnp.asarray, surf)
    for tile in range(8):
        k = jax.random.fold_in(jax.random.fold_in(key, 0), tile)
        sl = slice(tile * per, (tile + 1) * per)
        off = jax.random.uniform(jax.random.fold_in(k, 2), (per,))
        t_hit, bg = trace_surface_pass(
            dscene, fsj, surfj, cfg, jnp.asarray(o[sl]),
            jnp.asarray(d[sl]), jax.random.fold_in(k, 3),
        )
        rgba = trace_dvr(
            dscene, fsj, cfg, jnp.asarray(o[sl]), jnp.asarray(d[sl]),
            off, t_end_world=t_hit,
        )
        single[sl] = np.asarray(composite_background(rgba, bg))
    assert np.isfinite(sharded).all()
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)
    # the streamlines must actually appear in the image
    flat = single.reshape(-1, 3)
    assert (np.abs(flat - flat.mean(0)).max() > 0.05)
