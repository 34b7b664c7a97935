"""Sweep-based AO: the frame-coherent shadow-volume estimator must
converge (in progressive mean) to the wavefront's per-pixel hemisphere
AO — same Monte-Carlo integral, different importance sampling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render.camera import Camera
from owlexabrick_tpu.render.dvr import RenderConfig
from owlexabrick_tpu.render.frame import make_frame_state
from owlexabrick_tpu.render.renderer import Renderer
from owlexabrick_tpu.tools.artificial import parse_grids_text

from conftest import EX2

SIZE = 20


def _fs(cam):
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.1, opacity_scale=0.0,
                          ao_enabled=True, ao_length=6.0)
    return dataclasses.replace(
        fs,
        iso_enabled=np.array([True, False]),
        iso_value=np.array([3.5, 0.0], np.float32),
        iso_channel=np.zeros(2, np.int32),
    )


def _mean_image(r, frames):
    img = None
    for _ in range(frames):
        img = r.render()
    # progressive display is the running average already
    return img.view(np.uint8).reshape(SIZE, SIZE, 4).astype(np.float64)


def test_ao_pooled_directions_cut_variance():
    """The per-frame direction pool (RenderConfig.ao_dirs) must reduce
    both per-pixel variance and frame-coherent error vs the D=1
    shared-direction degenerate case, with the same expectation — the
    pooled estimator's whole point (reference per-pixel cosine draws,
    exabrick.cu:1612-1645, are the D->inf limit)."""
    from owlexabrick_tpu.render.ao_sweep import ao_shadow_fast

    n = 24
    val = np.zeros((n, n, n), np.float32)
    val[8:10] = 1.0  # a flat occluder slab, z in [8, 10)
    lat = (jnp.asarray(val), jnp.ones((n, n, n), bool),
           jnp.zeros(3, jnp.float32), jnp.float32(1.0))
    fs = dataclasses.replace(
        _fs(Camera.look_at([0, 0, 9], [0, 0, 0], [0, 1, 0], 30.0,
                           SIZE, SIZE)),
        iso_value=np.array([0.5, 0.0], np.float32),
        ao_length=np.float32(10.0),
    )
    p = 128
    rng = np.random.default_rng(0)
    xy = rng.uniform(4, 20, (p, 2)).astype(np.float32)
    hits = jnp.asarray(
        np.concatenate([np.full((p, 1), 12.0, np.float32), xy], 1)
    )
    # down-facing normals (grid zyx): every hit sees the slab below
    normals = jnp.asarray(
        np.tile(np.asarray([[-1.0, 0, 0]], np.float32), (p, 1))
    )
    f = jax.jit(
        lambda key, d: ao_shadow_fast(lat, fs, hits, normals, key,
                                      ao_samples=2, ao_dirs=d),
        static_argnums=1,
    )
    stats = {}
    for d in (2, 8):
        frames = np.stack(
            [np.asarray(f(jax.random.PRNGKey(i), d)) for i in range(24)]
        )
        stats[d] = (frames.mean(), frames.var(0).mean(),
                    frames.mean(1).var())
    mean1, pvar1, fvar1 = stats[2]
    mean4, pvar4, fvar4 = stats[8]
    # fully-occluded down-facing hits: truth ~1.  A small pool's weight
    # truncates more against the [0,1] clip, so the larger pool sits at
    # least as close to truth (D=1/4/8 measured 0.79/0.88/0.90 at 64
    # frames, 2026-08)
    assert mean4 > mean1 - 0.02, (mean1, mean4)
    assert 0.55 < mean1 <= 1.0 and 0.75 < mean4 <= 1.0, (mean1, mean4)
    # a larger pool must cut both variance components materially
    assert pvar4 < 0.7 * pvar1, (pvar1, pvar4)
    assert fvar4 < 0.7 * fvar1, (fvar1, fvar4)


@pytest.mark.slow
def test_ao_sweep_converges_to_wavefront():
    lower, level, scal = parse_grids_text(EX2)
    scene, *_ = scene_from_cells(lower, level, [scal])
    cam = Camera.look_at([4.0, 4.0, 30.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, SIZE, SIZE)
    cfg = RenderConfig(num_channels=1, iso_surfaces=True, ao_samples=2,
                       gradient_shading_iso=True)

    r_fast = Renderer(scene, SIZE, SIZE, cfg=cfg, frame_state=_fs(cam))
    assert r_fast.enable_fast_path(), "iso-only AO must take the fast path"
    a = _mean_image(r_fast, 48)

    r_exact = Renderer(scene, SIZE, SIZE, cfg=cfg, frame_state=_fs(cam))
    # r_exact keeps the wavefront path (enable_fast_path not called)
    b = _mean_image(r_exact, 48)

    # hit masks agree (AO does not move the surface)
    lit_a = a[..., :3].max(-1) > 8
    lit_b = b[..., :3].max(-1) > 8
    assert (lit_a == lit_b).mean() > 0.9

    both = lit_a & lit_b
    assert both.sum() > 8
    # progressive means agree within MC noise + lattice discretization
    diff = np.abs(a[both][:, :3] - b[both][:, :3]).mean() / 255.0
    assert diff < 0.1, diff


def test_ao_exact_progressive_converges_to_wavefront():
    """Renderer.ao_exact (the viewer's 'exact AO (progressive)' mode,
    VERDICT r3 task 9): the fast path swaps the sweep shadow volumes for
    per-frame exact hemisphere rays — its progressive mean must match
    the wavefront's own converged AO tightly (same estimator, amortized
    1 frame at a time like the reference's progressive refinement)."""
    lower, level, scal = parse_grids_text(EX2)
    scene, *_ = scene_from_cells(lower, level, [scal])
    cam = Camera.look_at([4.0, 4.0, 30.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, SIZE, SIZE)
    cfg = RenderConfig(num_channels=1, iso_surfaces=True, ao_samples=2,
                       gradient_shading_iso=True)

    r_prog = Renderer(scene, SIZE, SIZE, cfg=cfg, frame_state=_fs(cam))
    r_prog.ao_exact = True
    assert r_prog.enable_fast_path()
    a = _mean_image(r_prog, 48)

    r_exact = Renderer(scene, SIZE, SIZE, cfg=cfg, frame_state=_fs(cam))
    b = _mean_image(r_exact, 48)

    lit_a = a[..., :3].max(-1) > 8
    lit_b = b[..., :3].max(-1) > 8
    assert (lit_a == lit_b).mean() > 0.9
    both = lit_a & lit_b
    assert both.sum() > 8
    # same estimator, different RNG streams: only MC noise + the iso
    # sweep's surface discretization remain
    diff = np.abs(a[both][:, :3] - b[both][:, :3]).mean() / 255.0
    assert diff < 0.06, diff


@pytest.mark.slow
def test_ao_sweep_detects_occlusion():
    """Two facing iso planes across a gap: both AO paths must darken the
    facing surfaces by comparable amounts."""
    # a wide lower z-ramp with a block hovering close above it: the
    # visible (face-forward) iso surface of the ramp sees the block in
    # its hemisphere — real occlusion on the floor ring around it
    text = ("0 0 0 12 12 4 0 0 0 0 0 7 7 7 7\n"
            "2 2 6 8 8 4 0 0 0 0 0 7 7 7 7\n")
    lower, level, scal = parse_grids_text(text)
    scene, *_ = scene_from_cells(lower, level, [scal])
    cam = Camera.look_at([6.0, 6.0, 46.0], [6.0, 6.0, 6.0], [0, 1, 0],
                         26.0, SIZE, SIZE)

    def fs_ao(ao_len=16.0):
        fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.1,
                              opacity_scale=0.0, ao_enabled=True,
                              ao_length=ao_len)
        return dataclasses.replace(
            fs,
            iso_enabled=np.array([True, False]),
            iso_value=np.array([2.6, 0.0], np.float32),
            iso_channel=np.zeros(2, np.int32),
        )

    cfg = RenderConfig(num_channels=1, iso_surfaces=True, ao_samples=2,
                       gradient_shading_iso=True)
    cfg0 = dataclasses.replace(cfg, ao_samples=0)

    r_fast = Renderer(scene, SIZE, SIZE, cfg=cfg, frame_state=fs_ao())
    assert r_fast.enable_fast_path()
    a = _mean_image(r_fast, 48)

    r0 = Renderer(scene, SIZE, SIZE, cfg=cfg0, frame_state=fs_ao())
    assert r0.enable_fast_path()
    c = _mean_image(r0, 8)

    r_wf = Renderer(scene, SIZE, SIZE, cfg=cfg, frame_state=fs_ao())
    b = _mean_image(r_wf, 48)

    lit = c[..., :3].max(-1) > 8
    assert lit.sum() > 8
    dark_fast = (c[..., :3][lit] - a[..., :3][lit]).mean() / 255.0
    dark_wf = (c[..., :3][lit] - b[..., :3][lit]).mean() / 255.0
    # both paths must find real occlusion under the hovering block (the
    # block's own unoccluded top dilutes the means — calibrated 2026-08,
    # wf ~0.020, fast ~0.013 over the lit set)
    assert dark_fast > 0.005, dark_fast
    assert dark_wf > 0.005, dark_wf
    assert abs(dark_fast - dark_wf) < 0.05, (dark_fast, dark_wf)


def test_ao_mesh_with_iso_occluders_stays_fast():
    """Mesh AO with iso occluders runs on the fast path: the lattice
    shadow volumes supply iso occlusion and dense prim intersections
    the geometric part, under one shared-direction estimator."""
    from owlexabrick_tpu.render.surfaces import SurfaceData

    lower, level, scal = parse_grids_text(EX2)
    scene, *_ = scene_from_cells(lower, level, [scal])
    cam = Camera.look_at([4.0, 4.0, 30.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, SIZE, SIZE)
    z = np.zeros((0, 3), np.float32)
    surf = SurfaceData(
        tri_v0=np.zeros((1, 3), np.float32),
        tri_e1=np.asarray([[1.0, 0, 0]], np.float32),
        tri_e2=np.asarray([[0, 1.0, 0]], np.float32),
        tri_n=np.asarray([[0, 0, 1.0]], np.float32),
        seg_a=z, seg_b=z, seg_t=np.zeros(0, np.int32),
        seg_radius=np.float32(2.0),
    )
    cfg = RenderConfig(num_channels=1, iso_surfaces=True, ao_samples=2)
    r = Renderer(scene, SIZE, SIZE, cfg=cfg, frame_state=_fs(cam),
                 surfaces=surf)
    assert r.enable_fast_path()
    img = r.render().view(np.uint8).reshape(SIZE, SIZE, 4)
    assert np.isfinite(img.astype(np.float32)).all()
    assert (img[..., :3] > 8).any()


@pytest.mark.slow
def test_ao_combined_mesh_iso_statistics():
    """The combined estimator (lattice iso occlusion + geometric
    occlusion along shared directions) converges to the same darkening
    the wavefront's per-pixel AO finds, on a floor mesh under an iso
    block."""
    from owlexabrick_tpu.render.surfaces import SurfaceData

    lower, level, scal = parse_grids_text(EX2)
    scene, *_ = scene_from_cells(lower, level, [scal])
    cam = Camera.look_at([4.0, 10.0, 26.0], [4.0, 1.0, 4.0], [0, 1, 0],
                         38.0, SIZE, SIZE)
    # floor plane just under the volume: its pixels see the iso block
    # overhead as the only occluder
    v0 = np.asarray([[-6.0, -0.5, -6.0], [-6.0, -0.5, -6.0]], np.float32)
    e1 = np.asarray([[20.0, 0.0, 0.0], [0.0, 0.0, 20.0]], np.float32)
    e2 = np.asarray([[0.0, 0.0, 20.0], [20.0, 0.0, 0.0]], np.float32)
    n = np.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    z = np.zeros((0, 3), np.float32)
    surf = SurfaceData(tri_v0=v0, tri_e1=e1, tri_e2=e2, tri_n=n,
                       seg_a=z, seg_b=z, seg_t=np.zeros(0, np.int32),
                       seg_radius=np.float32(2.0))

    cfg = RenderConfig(num_channels=1, iso_surfaces=True, ao_samples=2,
                       gradient_shading_iso=True)
    cfg0 = dataclasses.replace(cfg, ao_samples=0)

    r_fast = Renderer(scene, SIZE, SIZE, cfg=cfg, frame_state=_fs(cam),
                      surfaces=surf)
    assert r_fast.enable_fast_path()
    a = _mean_image(r_fast, 48)

    r0 = Renderer(scene, SIZE, SIZE, cfg=cfg0, frame_state=_fs(cam),
                  surfaces=surf)
    assert r0.enable_fast_path()
    c = _mean_image(r0, 8)

    r_wf = Renderer(scene, SIZE, SIZE, cfg=cfg, frame_state=_fs(cam),
                    surfaces=surf)
    b = _mean_image(r_wf, 48)

    lit = c[..., :3].max(-1) > 8
    assert lit.sum() > 8
    dark_fast = (c[..., :3][lit] - a[..., :3][lit]).mean() / 255.0
    dark_wf = (c[..., :3][lit] - b[..., :3][lit]).mean() / 255.0
    assert dark_fast > 0.004, dark_fast
    assert dark_wf > 0.004, dark_wf
    assert abs(dark_fast - dark_wf) < 0.06, (dark_fast, dark_wf)
