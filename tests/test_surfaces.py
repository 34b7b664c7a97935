"""Surface passes: triangles, contour planes, iso surfaces (golden vs
oracle), clip box, and the full frame step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlexabrick_tpu.core.types import TriangleMesh
from owlexabrick_tpu.oracle import reference as oracle
from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render.camera import Camera
from owlexabrick_tpu.render.dvr import RenderConfig
from owlexabrick_tpu.render.frame import make_frame_state
from owlexabrick_tpu.render.iso import trace_iso_rays
from owlexabrick_tpu.render.scene import to_device
from owlexabrick_tpu.render.surfaces import (
    SurfaceData,
    trace_triangles,
    trace_contour_planes,
)

from conftest import EX2, EX4


def _scene(amr_fixture, text=EX2):
    lower, level, scal = amr_fixture(text)
    scene, *_ = scene_from_cells(lower, level, [scal])
    return scene


def test_triangle_hit():
    m = TriangleMesh(
        vertices=np.array(
            [[0, -5, -5], [0, 5, -5], [0, 0, 5]], np.float32
        ),
        indices=np.array([[0, 1, 2]], np.int32),
    )
    surf = jax.tree.map(jnp.asarray, SurfaceData.from_meshes([m]))
    o = jnp.asarray([[-3.0, 0.0, 0.0], [-3.0, 20.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    t, n = trace_triangles(surf, o, d, jnp.zeros(2), jnp.full(2, 1e9))
    assert np.isclose(float(t[0]), 3.0)
    assert not np.isfinite(float(t[1]))
    assert np.isclose(abs(float(n[0, 0])), 1.0)


def test_iso_matches_oracle(amr_fixture):
    scene = _scene(amr_fixture, EX2)
    dscene = to_device(scene)
    size = 8
    cam = Camera.look_at([12.0, 10.0, 14.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         50.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.5)
    fs = dataclasses.replace(
        fs,
        iso_enabled=np.array([True, False]),
        iso_value=np.array([3.5, 0.0], np.float32),
        iso_channel=np.zeros(2, np.int32),
    )
    cfg = RenderConfig(num_channels=1, iso_surfaces=True)
    o, d = cam.rays(size, size)
    t, n, c = jax.jit(trace_iso_rays, static_argnames="cfg")(
        dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d),
        jnp.zeros(o.shape[0]), jnp.full(o.shape[0], 2e10),
    )
    t = np.asarray(t)
    n = np.asarray(n)
    c = np.asarray(c)
    n_hits = 0
    for i in range(o.shape[0]):
        to, no, co = oracle.trace_iso_ray(scene, fs, o[i], d[i])
        if np.isfinite(to):
            n_hits += 1
            assert np.isfinite(t[i]), f"pixel {i}: oracle hit, jnp miss"
            np.testing.assert_allclose(t[i], to, rtol=1e-3, atol=1e-3)
            np.testing.assert_allclose(n[i], no, rtol=1e-2, atol=1e-2)
            np.testing.assert_allclose(c[i], co, rtol=1e-2, atol=1e-2)
        else:
            assert not np.isfinite(t[i]), f"pixel {i}: jnp hit, oracle miss"
    assert n_hits > 5  # the iso surface must actually be visible


def test_iso_central_differences_matches_oracle(amr_fixture):
    """Iso shading with ANALYTIC_GRADIENTS=OFF: CD normals with relocation
    through the iso-culled structure (gradientCD<true>)."""
    scene = _scene(amr_fixture, EX2)
    dscene = to_device(scene)
    size = 6
    cam = Camera.look_at([12.0, 10.0, 14.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         50.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.5)
    fs = dataclasses.replace(
        fs,
        iso_enabled=np.array([True, False]),
        iso_value=np.array([3.5, 0.0], np.float32),
        iso_channel=np.zeros(2, np.int32),
    )
    cfg = RenderConfig(num_channels=1, iso_surfaces=True,
                       analytic_gradients=False)
    o, d = cam.rays(size, size)
    t, n, c = jax.jit(trace_iso_rays, static_argnames="cfg")(
        dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d),
        jnp.zeros(o.shape[0]), jnp.full(o.shape[0], 2e10),
    )
    t, n, c = np.asarray(t), np.asarray(n), np.asarray(c)
    n_hits = 0
    for i in range(o.shape[0]):
        to, no, co = oracle.trace_iso_ray(
            scene, fs, o[i], d[i], analytic_gradients=False
        )
        if np.isfinite(to):
            n_hits += 1
            np.testing.assert_allclose(t[i], to, rtol=1e-3, atol=1e-3)
            np.testing.assert_allclose(n[i], no, rtol=1e-2, atol=1e-2)
            np.testing.assert_allclose(c[i], co, rtol=1e-2, atol=1e-2)
        else:
            assert not np.isfinite(t[i])
    assert n_hits > 3


def test_contour_plane(amr_fixture):
    scene = _scene(amr_fixture, EX2)
    dscene = to_device(scene)
    fs = make_frame_state(
        Camera.look_at([20, 4, 4], [0, 4, 4], [0, 1, 0], 40.0, 4, 4),
        1, [[0.0, 7.0]],
    )
    fs = dataclasses.replace(
        fs,
        contour_enabled=np.array([True, False, False]),
        contour_normal=np.array(
            [[1, 0, 0], [1, 0, 0], [1, 0, 0]], np.float32
        ),
        contour_offset=np.array([0.5, 0, 0], np.float32),
        contour_channel=np.zeros(3, np.int32),
    )
    cfg = RenderConfig(num_channels=1)
    o = jnp.asarray([[20.0, 4.0, 4.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    t, color, n = trace_contour_planes(
        dscene, fs, cfg, o, d, jnp.zeros(1), jnp.full(1, 1e9)
    )
    # offset 0.5 of world bounds [0,8] -> plane at x=4 -> t = 16
    assert np.isclose(float(t[0]), 16.0, atol=1e-3)
    assert np.all(np.isfinite(np.asarray(color)))


def test_render_step_accumulates(amr_fixture):
    from owlexabrick_tpu.render.renderer import Renderer

    scene = _scene(amr_fixture, EX2)
    r = Renderer(scene, width=16, height=16, cfg=RenderConfig(num_channels=1))
    cam = Camera.look_at([12.0, 10.0, 14.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         50.0, 16, 16)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7)
    r.fs = fs
    r.reset_accumulation()
    img1 = r.render()
    assert img1.shape == (16, 16)
    assert int(r.fs.frame_id) == 1
    img2 = r.render()
    # accumulated frames stay finite and in range
    acc = np.asarray(r.accum)
    assert np.isfinite(acc).all()
    # accum stores vec4(summed rgb, 1) like the reference (exabrick.cu:1712)
    assert (acc[:, 3] == 1.0).all()
    # something must be visible
    rgb = img1.view(np.uint8).reshape(16, 16, 4)[..., :3]
    assert rgb.max() > 0


def test_clip_box(amr_fixture):
    from owlexabrick_tpu.render.renderer import Renderer

    scene = _scene(amr_fixture, EX2)
    cam = Camera.look_at([12.0, 10.0, 14.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         50.0, 8, 8)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7)
    r = Renderer(scene, width=8, height=8, cfg=RenderConfig(num_channels=1),
                 frame_state=fs)
    full = r.render().view(np.uint8).reshape(8, 8, 4)[..., :3].copy()
    # clip to an empty sliver far outside: image goes black
    r.set_clip_box(True, lo=[100, 100, 100], hi=[101, 101, 101])
    clipped = r.render().view(np.uint8).reshape(8, 8, 4)[..., :3]
    assert full.max() > 0
    assert clipped.max() == 0


def test_renderer_fast_path_matches_exact(amr_fixture):
    """Renderer.enable_fast_path: the slab-sweep DVR through the Renderer
    must closely match the exact wavefront render for an axis-aligned
    camera."""
    from owlexabrick_tpu.render.renderer import Renderer

    scene = _scene(amr_fixture, EX2)
    size = 16
    cam = Camera.look_at([4.0, 4.0, 30.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.1, opacity_scale=0.5)

    r1 = Renderer(scene, size, size, cfg=RenderConfig(num_channels=1),
                  frame_state=fs)
    exact = r1.render()

    r2 = Renderer(scene, size, size, cfg=RenderConfig(num_channels=1),
                  frame_state=fs)
    assert r2.enable_fast_path()
    fast = r2.render()

    a = exact.view(np.uint8).reshape(size, size, 4)[..., :3].astype(float)
    b = fast.view(np.uint8).reshape(size, size, 4)[..., :3].astype(float)
    rmse = np.sqrt(((a - b) / 255.0) ** 2).mean()
    assert rmse < 0.03, rmse

    # tilted camera: fast path engages via grid reorientation
    cam3 = Camera.look_at([12.0, 10.0, 14.0], [4.0, 4.0, 4.0], [0, 1, 0],
                          50.0, size, size)
    r3 = Renderer(scene, size, size, cfg=RenderConfig(num_channels=1),
                  frame_state=make_frame_state(cam3, 1, [[0.0, 7.0]]))
    assert r3.enable_fast_path()
    img3 = r3.render()
    assert (img3.view(np.uint8).reshape(size, size, 4)[..., :3] > 10).any()
