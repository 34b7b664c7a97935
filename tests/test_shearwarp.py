"""Shear-warp exact tilted-camera fast path: the sweep of an
intermediate axis-aligned camera plus one homography warp must converge
to the exact wavefront render for arbitrary orientations (the golden
criterion the reorientation preview could not meet)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render.camera import Camera
from owlexabrick_tpu.render.dvr import RenderConfig, trace_dvr
from owlexabrick_tpu.render.frame import make_frame_state
from owlexabrick_tpu.render.scene import to_device
from owlexabrick_tpu.render.shearwarp import (
    inter_dims,
    render_slabs_shearwarp,
    setup_shearwarp,
    warp_bicubic,
    warp_bilinear,
)
from owlexabrick_tpu.render.slabs import (
    SlabConfig,
    build_level_grids,
    principal_axis,
    render_slabs_camera,
)

from conftest import EX2, EX3

SIZE = 32


def _setup(text, axis_hint=None, eye=(14.0, 11.0, 17.0), up=(0, 1, 0)):
    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(text)
    scene, bricks, *_ = scene_from_cells(lower, level, [scal])
    cam = Camera.look_at(list(eye), [4.0, 4.0, 4.0], list(up), 35.0,
                         SIZE, SIZE)
    view = np.asarray(cam.dir00) + 0.5 * SIZE * (
        np.asarray(cam.dir_du) + np.asarray(cam.dir_dv)
    )
    axis = principal_axis(view) if axis_hint is None else axis_hint
    grids = build_level_grids(bricks, scene.scalars, axis=axis)
    return scene, grids, cam, axis


def _wavefront(scene, cam, fs, size=SIZE):
    o, d = cam.rays(size, size)
    return np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            to_device(scene), fs, RenderConfig(num_channels=1),
            jnp.asarray(o), jnp.asarray(d), jnp.zeros(o.shape[0]),
        )
    )


@pytest.mark.parametrize(
    "eye,up,tol,tol_hq",
    [
        ((14.0, 11.0, 17.0), (0, 1, 0), 2e-2, 1e-2),  # tilted, two axes
        ((4.0, 4.0, 28.0), (0.4, 1.0, 0.1), 2e-2, 1e-2),  # rolled
        # looking down with the eye grazing the volume's top face at
        # ~1.3 degrees: the silhouette sliver is one lattice cell wide
        # (sub-pixel at real resolutions; jittered accumulation averages
        # it), so the single-frame rmse bound is looser here
        ((4.0, 26.0, 9.0), (0, 0, 1), 4e-2, 4e-2),
        ((4.0, 26.0, 12.0), (0, 0, 1), 2e-2, 1e-2),  # looking down
    ],
)
def test_shearwarp_matches_wavefront_tilted(eye, up, tol, tol_hq):
    """Golden: tilted/rolled cameras through shear-warp vs trace_dvr."""
    scene, grids, cam, axis = _setup(EX2, eye=eye, up=up)
    fs = jax.tree.map(
        jnp.asarray,
        make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.05, opacity_scale=0.5),
    )
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent / 0.05)),
                     chunk=32)
    want = _wavefront(scene, cam, fs)
    assert want[:, 3].max() > 0.5  # non-trivial image

    # interactive default (oversample 1.5): residual = slab quadrature +
    # one bicubic image resample, concentrated at silhouettes of this
    # very coarse 8^3-cells-over-32px fixture
    got = np.asarray(
        render_slabs_shearwarp(grids, fs, cfg, cam, SIZE, SIZE)
    )
    err = np.abs(got - want)
    assert float(np.sqrt((err ** 2).mean())) <= tol
    a = want[:, 3].reshape(SIZE, SIZE)
    gy, gx = np.gradient(a)
    interior = ((np.abs(gy) + np.abs(gx)) <= 0.05).reshape(-1)
    if interior.sum() > 32:
        assert float(np.sqrt((err[interior] ** 2).mean())) <= 5e-3

    # quality setting: denser intermediate lattice meets the 1e-2 golden
    # criterion including silhouettes
    got_hq = np.asarray(
        render_slabs_shearwarp(grids, fs, cfg, cam, SIZE, SIZE,
                               oversample=2.5)
    )
    rmse_hq = float(np.sqrt(((got_hq - want) ** 2).mean()))
    assert rmse_hq <= tol_hq, rmse_hq


def test_shearwarp_multilevel_scene():
    """Level-boundary continuity under a tilted camera (EX3 fixture)."""
    scene, grids, cam, axis = _setup(EX3, eye=(16.0, 12.0, 19.0))
    fs = jax.tree.map(
        jnp.asarray,
        make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.1, opacity_scale=0.5),
    )
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent / 0.1)),
                     chunk=32)
    got = np.asarray(
        render_slabs_shearwarp(grids, fs, cfg, cam, SIZE, SIZE)
    )
    want = _wavefront(scene, cam, fs)
    assert want[:, 3].max() > 0.3
    rmse = float(np.sqrt(((got - want) ** 2).mean()))
    assert rmse <= 2.5e-2, rmse


def test_setup_rejects_oblique_frustum():
    """A frustum whose corner rays cross the slab-plane direction
    (here a 178-degree fov: corners pass 90 degrees off-axis) cannot be
    factorized; setup returns None and the Renderer keeps a working
    bounded-time fallback.  (Strong-but-finite tilt, e.g. 160-degree
    fov, now factorizes via the uniform-lattice fallback.)"""
    cam = Camera.look_at([30.0, 4.0, 4.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         178.0, SIZE, SIZE)
    iw, ih = inter_dims(SIZE, SIZE)
    assert setup_shearwarp(cam, 0, SIZE, SIZE, iw, ih) is None


def test_renderer_fast_path_tilted_is_shearwarp():
    """The Renderer's fast path routes tilted cameras through shear-warp
    and its accumulated output matches the exact wavefront Renderer far
    tighter than the old reorientation preview (rmse 0.15)."""
    from owlexabrick_tpu.render.renderer import Renderer

    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(EX2)
    scene, *_ = scene_from_cells(lower, level, [scal])
    size = 32
    cam = Camera.look_at([14.0, 11.0, 17.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         35.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.1, opacity_scale=0.5)

    r1 = Renderer(scene, size, size, cfg=RenderConfig(num_channels=1),
                  frame_state=fs)
    exact = r1.render_frames(4)
    r2 = Renderer(scene, size, size, cfg=RenderConfig(num_channels=1),
                  frame_state=fs)
    assert r2.enable_fast_path()
    assert r2._fast[2] == "shearwarp"
    fast = r2.render_frames(4)
    a = exact.view(np.uint8).reshape(size, size, 4)[..., :3].astype(float)
    b = fast.view(np.uint8).reshape(size, size, 4)[..., :3].astype(float)
    rmse = np.sqrt((((a - b) / 255.0) ** 2).mean())
    assert rmse < 0.05, rmse
    assert a.max() > 30 and b.max() > 30
