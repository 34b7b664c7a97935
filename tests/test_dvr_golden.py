"""Golden-image tests: the jit wavefront DVR renderer must match the
scalar numpy oracle (a literal restatement of the CUDA formulas)."""

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

from conftest import EX2, EX3, EX4


def _setup(amr_fixture, text, vmax, size=12):
    lower, level, scal = amr_fixture(text)
    scene, *_ = scene_from_cells(lower, level, [scal])
    cam = Camera.look_at(
        from_=[12.0, 10.0, 14.0], at=[4.0, 2.0, 2.0], up=[0, 1, 0],
        fovy_degrees=50.0, width=size, height=size,
    )
    fs = make_frame_state(
        cam, num_channels=1, xf_domains=[[0.0, vmax]], dt=0.7,
    )
    o, d = cam.rays(size, size)
    return scene, fs, o, d


@pytest.mark.parametrize(
    "text,vmax", [(EX2, 7.0), (EX3, 7.0), (EX4, 2.0)]
)
def test_dvr_matches_oracle(amr_fixture, text, vmax):
    scene, fs, o, d = _setup(amr_fixture, text, vmax)
    cfg = RenderConfig(num_channels=1)
    dscene = to_device(scene)
    offset = jnp.zeros(o.shape[0])
    rgba = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d), offset
        )
    )
    for i in range(o.shape[0]):
        want = oracle.trace_dvr_ray(scene, fs, o[i], d[i], num_channels=1)
        np.testing.assert_allclose(
            rgba[i], want, rtol=5e-3, atol=5e-3,
            err_msg=f"pixel {i} ray {o[i]}->{d[i]}",
        )


def test_dvr_space_skipping_equals_no_skipping(amr_fixture):
    """With a full-range transfer function, space skipping must not change
    the image; with a TF that zeroes everything, the image must be empty."""
    scene, fs, o, d = _setup(amr_fixture, EX2, 7.0)
    dscene = to_device(scene)
    offset = jnp.zeros(o.shape[0])
    f = jax.jit(trace_dvr, static_argnames="cfg")
    a = np.asarray(f(dscene, fs, RenderConfig(space_skipping=True),
                     jnp.asarray(o), jnp.asarray(d), offset))
    b = np.asarray(f(dscene, fs, RenderConfig(space_skipping=False),
                     jnp.asarray(o), jnp.asarray(d), offset))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    import dataclasses

    fs0 = dataclasses.replace(fs, xf_lut=fs.xf_lut * np.array([1, 1, 1, 0.0]))
    z = np.asarray(f(dscene, fs0, RenderConfig(space_skipping=True),
                     jnp.asarray(o), jnp.asarray(d), offset))
    assert np.abs(z).max() == 0.0


def test_dvr_gradient_shading_runs(amr_fixture):
    scene, fs, o, d = _setup(amr_fixture, EX2, 7.0, size=6)
    dscene = to_device(scene)
    offset = jnp.zeros(o.shape[0])
    cfg = RenderConfig(num_channels=1, gradient_shading_dvr=True)
    rgba = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d), offset
        )
    )
    assert np.isfinite(rgba).all()
    for i in range(o.shape[0]):
        want = oracle.trace_dvr_ray(
            scene, fs, o[i], d[i], num_channels=1, gradient_shading=True
        )
        np.testing.assert_allclose(rgba[i], want, rtol=1e-2, atol=1e-2)


def test_central_differences_matches_oracle(amr_fixture):
    """ANALYTIC_GRADIENTS=OFF parity: shading gradients via central
    differences with per-offset leaf relocation (gradientCD,
    exabrick.cu:832-880)."""
    scene, fs, o, d = _setup(amr_fixture, EX2, 7.0, size=6)
    dscene = to_device(scene)
    offset = jnp.zeros(o.shape[0])
    cfg = RenderConfig(num_channels=1, gradient_shading_dvr=True,
                       analytic_gradients=False)
    rgba = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d), offset
        )
    )
    assert np.isfinite(rgba).all()
    n_diff = 0
    cfg_a = RenderConfig(num_channels=1, gradient_shading_dvr=True)
    rgba_a = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, fs, cfg_a, jnp.asarray(o), jnp.asarray(d), offset
        )
    )
    for i in range(o.shape[0]):
        want = oracle.trace_dvr_ray(
            scene, fs, o[i], d[i], num_channels=1, gradient_shading=True,
            analytic_gradients=False,
        )
        np.testing.assert_allclose(rgba[i], want, rtol=1e-2, atol=1e-2)
        if not np.allclose(rgba[i], rgba_a[i], atol=1e-3):
            n_diff += 1
    # CD and analytic gradients shade differently on a non-trivial scene
    assert n_diff > 0


def test_gradient_cd_point_values(amr_fixture):
    """gradient_cd (batched, relocating) == oracle at probe points, and
    approximates the true directional derivative of the reconstruction."""
    from owlexabrick_tpu.render.dvr import gradient_cd

    lower, level, scal = amr_fixture(EX3)
    scene, *_ = scene_from_cells(lower, level, [scal])
    dscene = to_device(scene)
    rng = np.random.default_rng(3)
    pts = rng.uniform(0.6, 3.4, (24, 3)).astype(np.float32)
    delta = 0.75
    g = np.asarray(gradient_cd(dscene, jnp.asarray(pts), 0, delta))
    for i, p in enumerate(pts):
        want = oracle.gradient_cd(scene, p, 0, delta)
        np.testing.assert_allclose(g[i], want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"point {p}")

    # FAST_CENTRAL_DIFFERENCES=ON: samples stay in the caller's region
    from owlexabrick_tpu.render.dvr import locate_leaf

    node = locate_leaf(dscene, jnp.asarray(pts))
    rids = jnp.clip(dscene.tree_leaf[node], 0, None)
    gf = np.asarray(
        gradient_cd(dscene, jnp.asarray(pts), 0, delta, fixed_rid=rids)
    )
    assert np.isfinite(gf).all()
    for i, p in enumerate(pts):
        want = oracle.gradient_cd(
            scene, p, 0, delta, fixed_region=int(rids[i])
        )
        np.testing.assert_allclose(gf[i], want, rtol=1e-4, atol=1e-5)


def test_interleaved_offset_matches(amr_fixture):
    scene, fs, o, d = _setup(amr_fixture, EX2, 7.0, size=6)
    dscene = to_device(scene)
    rng = np.random.default_rng(5)
    offs = rng.uniform(0, 1, o.shape[0]).astype(np.float32)
    cfg = RenderConfig(num_channels=1)
    rgba = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d), jnp.asarray(offs)
        )
    )
    for i in range(o.shape[0]):
        want = oracle.trace_dvr_ray(
            scene, fs, o[i], d[i], num_channels=1, offset=float(offs[i])
        )
        np.testing.assert_allclose(rgba[i], want, rtol=5e-3, atol=5e-3)


def test_nearest_mode_matches_oracle(amr_fixture):
    """Non-basis (EXPLICIT_BASIS_METHOD=OFF) mode: brick-bounds traversal
    with nearest-cell sampling, golden vs oracle."""
    from owlexabrick_tpu.builder.bricker import build_bricks
    from owlexabrick_tpu.core.types import ScalarField
    from owlexabrick_tpu.pipeline import bricks_from_build
    from owlexabrick_tpu.render.scene import build_scene, to_device

    lower, level, scal = amr_fixture(EX4)
    res = build_bricks(lower, level)
    bricks, ids = bricks_from_build(res)
    scene, regions, tree = build_scene(
        bricks, ids, [ScalarField.from_values("f", scal)],
        basis_method=False,
    )
    assert regions.max_bricks_per_region == 1

    size = 10
    cam = Camera.look_at([12.0, 10.0, 14.0], [4.0, 2.0, 2.0], [0, 1, 0],
                         50.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 2.0]], dt=0.7)
    cfg = RenderConfig(num_channels=1, basis_method=False)
    o, d = cam.rays(size, size)
    rgba = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            to_device(scene), fs, cfg, jnp.asarray(o), jnp.asarray(d),
            jnp.zeros(o.shape[0]),
        )
    )
    n_hit = 0
    for i in range(o.shape[0]):
        want = oracle.trace_dvr_ray(
            scene, fs, o[i], d[i], num_channels=1, basis_method=False
        )
        if want[3] > 0:
            n_hit += 1
        np.testing.assert_allclose(rgba[i], want, rtol=5e-3, atol=5e-3)
    assert n_hit > 10
