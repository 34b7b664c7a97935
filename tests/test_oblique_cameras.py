"""Every camera must render in bounded time (VERDICT r2 weak #3).

The reference renders any camera at full rate (exabrick.cu:1662-1699);
the fast path must therefore cover arbitrary orientations with either
the exact shear-warp factorization (axes tried least-oblique first) or
the bounded-time reorientation preview — NEVER a silent fall-through to
the exact wavefront frame, which costs minutes at interactive sizes.
"""

import numpy as np
import pytest

from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render import renderer as renderer_mod
from owlexabrick_tpu.render.camera import Camera
from owlexabrick_tpu.render.dvr import RenderConfig
from owlexabrick_tpu.render.frame import make_frame_state
from owlexabrick_tpu.render.renderer import Renderer
from owlexabrick_tpu.tools.artificial import parse_grids_text

from conftest import EX3

W, H = 40, 24  # non-square so du/dv swaps are exercised


def _renderer():
    lower, level, scal = parse_grids_text(EX3)
    scene, *_ = scene_from_cells(lower, level, [scal])
    cam = Camera.look_at([6.0, 6.0, 26.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         45.0, W, H)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.5, opacity_scale=0.6)
    return Renderer(scene, W, H, cfg=RenderConfig(num_channels=1),
                    frame_state=fs)


def _orbit_cameras(n, rng, fov=45.0):
    """Random orbit cameras: positions on a sphere around the volume,
    random up vectors — includes near-diagonal and near-polar views."""
    at = np.asarray([4.0, 4.0, 4.0])
    cams = []
    for _ in range(n):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        up = rng.normal(size=3)
        up /= np.linalg.norm(up)
        if abs(up @ d) > 0.95:  # degenerate look_at basis
            up = np.asarray([0.0, 1.0, 0.0])
        cams.append(Camera.look_at(
            list(at + 24.0 * d), list(at), list(up), fov, W, H
        ))
    return cams


@pytest.mark.slow
def test_orbit_sweep_never_hits_wavefront(monkeypatch):
    """>=100 random orbit cameras: every frame renders through the fast
    path (shear-warp or preview) — the exact wavefront step must never
    run, and the frames must be finite images."""
    r = _renderer()

    def _forbidden(*a, **k):  # pragma: no cover - failure path
        raise AssertionError(
            "exact wavefront render_step reached from the fast path"
        )

    monkeypatch.setattr(renderer_mod, "render_step", _forbidden)
    monkeypatch.setattr(renderer_mod, "render_step_packed", _forbidden)

    rng = np.random.default_rng(7)
    n_shear = 0
    n_preview = 0
    for cam in _orbit_cameras(100, rng):
        r.update_camera(cam)
        assert r.enable_fast_path()
        mode = r._fast[2]
        if mode == "shearwarp":
            n_shear += 1
        elif isinstance(mode, Camera):
            n_preview += 1
        img = r.render()
        assert img.shape == (H, W)
        rgba = img.view(np.uint8)
        assert np.isfinite(rgba.astype(np.float64)).all()
    # best-axis selection + the uniform-lattice fallback keep the EXACT
    # path for nearly all orbit views at 45 deg fov; the preview only
    # covers the residual sign-change frustums (measured 97/100)
    assert n_shear + n_preview >= 90  # axis-separable views fill the rest
    assert n_shear >= 90, (n_shear, n_preview)


def test_best_axis_beats_principal_axis():
    """A frustum too oblique for the view-principal axis but fine for
    another must still factorize (the round-2 cliff: only argmax|view|
    was tried)."""
    r = _renderer()
    rng = np.random.default_rng(3)
    found_alternative = False
    for cam in _orbit_cameras(200, rng, fov=55.0):
        from owlexabrick_tpu.render.shearwarp import (
            inter_dims,
            setup_shearwarp,
        )
        from owlexabrick_tpu.render.slabs import camera_to_voxel

        cam_v = camera_to_voxel(
            cam, np.asarray(r.scene.voxel_from_world)
        )
        view = np.asarray(cam_v.dir00) + 0.5 * (
            W * np.asarray(cam_v.dir_du) + H * np.asarray(cam_v.dir_dv)
        )
        principal = int(np.argmax(np.abs(view)))
        iw, ih = inter_dims(W, H)
        principal_ok = setup_shearwarp(
            cam_v, principal, W, H, iw, ih
        ) is not None
        pick = r._pick_shearwarp(cam_v)
        if pick is not None and not principal_ok:
            found_alternative = True
            break
    assert found_alternative, (
        "no camera exercised the multi-axis rescue — widen the sweep"
    )


def test_uniform_lattice_matches_wavefront():
    """Strong-tilt cameras that need the uniform-xi lattice fallback
    (the adaptive map's pole inside the corner range) must still match
    the exact wavefront render within the shear-warp golden budget."""
    import jax
    import jax.numpy as jnp

    from conftest import EX2
    from owlexabrick_tpu.render.dvr import trace_dvr
    from owlexabrick_tpu.render.scene import to_device
    from owlexabrick_tpu.render.shearwarp import (
        inter_dims,
        render_slabs_shearwarp,
        setup_shearwarp,
    )
    from owlexabrick_tpu.render.slabs import SlabConfig, build_level_grids

    lower, level, scal = parse_grids_text(EX2)
    scene, bricks, *_ = scene_from_cells(lower, level, [scal])
    size = 32
    at = np.asarray([4.0, 4.0, 4.0])
    rng = np.random.default_rng(11)
    uniform = (0.0, 1.0, 1.0, 0.0)
    pick = None
    for _ in range(200):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        up = rng.normal(size=3)
        up /= np.linalg.norm(up)
        if abs(up @ d) > 0.95:
            up = np.asarray([0.0, 1.0, 0.0])
        cam = Camera.look_at(list(at + 22.0 * d), list(at), list(up),
                             50.0, size, size)
        iw, ih = inter_dims(size, size)
        for axis in range(3):
            sw = setup_shearwarp(cam, axis, size, size, iw, ih)
            if sw is not None and (sw.coef_u == uniform
                                   or sw.coef_v == uniform):
                pick = (cam, axis, sw)
                break
        if pick:
            break
    assert pick is not None, "no camera needed the uniform lattice"
    cam, axis, sw = pick
    grids = build_level_grids(bricks, scene.scalars, axis=axis)
    fs = jax.tree.map(
        jnp.asarray,
        make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.1, opacity_scale=0.5),
    )
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent / 0.1)),
                     chunk=32)
    got = np.asarray(
        render_slabs_shearwarp(grids, fs, cfg, cam, size, size, sw=sw)
    )
    o, dd = cam.rays(size, size)
    want = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            to_device(scene), fs, RenderConfig(num_channels=1),
            jnp.asarray(o), jnp.asarray(dd), jnp.zeros(o.shape[0]),
        )
    )
    assert want[:, 3].max() > 0.3
    rmse = float(np.sqrt(((got - want) ** 2).mean()))
    assert rmse <= 2.5e-2, rmse


def test_preview_fallback_is_taken_when_no_axis_works(monkeypatch):
    """When every axis refuses the factorization mid-orbit, the frame
    must come from the reorientation preview, not the wavefront path."""
    r = _renderer()
    # a wide-fov diagonal view; then force the factorization to fail so
    # the preview branch is exercised deterministically
    cam = Camera.look_at([18.0, 17.0, 19.0], [4.0, 4.0, 4.0],
                         [0.3, 0.8, 0.52], 55.0, W, H)
    r.update_camera(cam)
    assert r.enable_fast_path()

    def _forbidden(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("wavefront render_step reached")

    monkeypatch.setattr(renderer_mod, "render_step", _forbidden)
    monkeypatch.setattr(renderer_mod, "render_step_packed", _forbidden)
    monkeypatch.setattr(Renderer, "_pick_shearwarp", lambda self, c: None)
    # routing was computed before the patch; re-route through the
    # blocked factorization to land on the preview
    assert r.enable_fast_path()
    assert isinstance(r._fast[2], Camera)  # preview routing
    img = r.render()
    assert img.shape == (H, W)


def test_mid_orbit_failure_renders_preview_frame(monkeypatch):
    """The per-frame re-factorization inside _render_fast must also take
    the preview (shear-warp routing chosen, then the camera moves to an
    impossible orientation before the next frame)."""
    r = _renderer()
    cam = Camera.look_at([19.0, 10.0, 15.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         45.0, W, H)
    r.update_camera(cam)
    assert r.enable_fast_path()
    assert r._fast[2] == "shearwarp"

    def _forbidden(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("wavefront render_step reached")

    monkeypatch.setattr(renderer_mod, "render_step", _forbidden)
    monkeypatch.setattr(renderer_mod, "render_step_packed", _forbidden)
    # the camera "moves" such that no axis admits the factorization
    monkeypatch.setattr(Renderer, "_pick_shearwarp", lambda self, c: None)
    img = r.render()  # must not raise, must not call render_step
    assert img.shape == (H, W)
