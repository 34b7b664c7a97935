"""Multi-channel (multi-field) DVR: wavefront vs oracle, slab vs wavefront."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlexabrick_tpu.oracle import reference as oracle
from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render.camera import Camera
from owlexabrick_tpu.render.dvr import RenderConfig, trace_dvr
from owlexabrick_tpu.render.frame import make_frame_state
from owlexabrick_tpu.render.scene import to_device

from conftest import EX2


@pytest.fixture(scope="module")
def two_channel_scene():
    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(EX2)
    scal2 = 7.0 - scal  # second field: inverted ramp
    scene, *_ = scene_from_cells(
        lower, level, [scal, scal2], num_range_channels=2
    )
    return scene


def _fs(cam):
    fs = make_frame_state(
        cam, num_channels=2,
        xf_domains=[[0.0, 7.0], [0.0, 7.0]], dt=0.6, opacity_scale=0.5,
    )
    # different LUT for channel 1 so ordering bugs show up
    lut = np.asarray(fs.xf_lut).copy()
    lut[1, :, :3] = lut[1, ::-1, :3]
    return dataclasses.replace(fs, xf_lut=lut)


def test_two_channel_wavefront_matches_oracle(two_channel_scene):
    scene = two_channel_scene
    size = 8
    cam = Camera.look_at([12.0, 10.0, 14.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         50.0, size, size)
    fs = _fs(cam)
    cfg = RenderConfig(num_channels=2)
    o, d = cam.rays(size, size)
    rgba = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            to_device(scene), jax.tree.map(jnp.asarray, fs), cfg,
            jnp.asarray(o), jnp.asarray(d), jnp.zeros(o.shape[0]),
        )
    )
    for i in range(o.shape[0]):
        want = oracle.trace_dvr_ray(scene, fs, o[i], d[i], num_channels=2)
        np.testing.assert_allclose(rgba[i], want, rtol=5e-3, atol=5e-3)


def test_two_channel_slab_converges(two_channel_scene):
    from owlexabrick_tpu.render.slabs import (
        SlabConfig,
        build_level_grids,
        render_slabs_camera,
    )
    from owlexabrick_tpu.io.formats import read_cells  # noqa: F401

    scene = two_channel_scene
    size = 16
    cam = Camera.look_at([4.0, 4.0, 30.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, size, size)
    fs = jax.tree.map(jnp.asarray, _fs(cam))
    fs = dataclasses.replace(fs, dt=jnp.float32(0.05))

    # rebuild bricks to get the grids (scene doesn't keep the Bricks table)
    from owlexabrick_tpu.tools.artificial import parse_grids_text
    from owlexabrick_tpu.builder.bricker import build_bricks
    from owlexabrick_tpu.pipeline import bricks_from_build

    lower, level, scal = parse_grids_text(EX2)
    res = build_bricks(lower, level)
    bricks, ids = bricks_from_build(res)
    grids = build_level_grids(bricks, scene.scalars, axis=2)
    assert grids.num_channels == 2

    rgba_slab = np.asarray(
        render_slabs_camera(
            grids, fs, SlabConfig(num_channels=2, nslabs=256, chunk=32),
            cam, size, size,
        )
    )
    o, d = cam.rays(size, size)
    rgba_wf = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            to_device(scene), fs, RenderConfig(num_channels=2),
            jnp.asarray(o), jnp.asarray(d), jnp.zeros(o.shape[0]),
        )
    )
    rmse = np.sqrt(((rgba_slab - rgba_wf) ** 2).mean())
    assert rmse < 0.03, rmse
    assert rgba_wf[:, 3].max() > 0.2


def test_two_channel_renderer_fast_path(two_channel_scene):
    """Renderer.enable_fast_path now covers multi-channel DVR (both the
    axis-aligned direct sweep and the reoriented tilted camera)."""
    from owlexabrick_tpu.render.renderer import Renderer

    scene = two_channel_scene
    size = 16
    for eye, expect_reorient in (
        ([4.0, 4.0, 30.0], False),
        ([14.0, 10.0, 20.0], True),
    ):
        cam = Camera.look_at(eye, [4.0, 4.0, 4.0], [0, 1, 0],
                             30.0, size, size)
        fs = _fs(cam)
        r = Renderer(scene, size, size,
                     cfg=RenderConfig(num_channels=2), frame_state=fs)
        assert r.enable_fast_path()
        assert (r._fast[2] is not None) == expect_reorient
        img_fast = r.render()
        assert (img_fast != 0).any()
        # exact render of the same frame state for comparison
        r2 = Renderer(scene, size, size,
                      cfg=RenderConfig(num_channels=2), frame_state=fs)
        img_exact = r2.render()
        a = img_fast.view(np.uint8).reshape(size, size, 4).astype(int)
        b = img_exact.view(np.uint8).reshape(size, size, 4).astype(int)
        # coarse agreement (different quadrature; reorient adds resample
        # blur) — silhouettes and colors must line up
        frac_close = (np.abs(a - b).max(-1) < 64).mean()
        assert frac_close > 0.7, (eye, frac_close)
