"""ALLOW_EMPTY_CELLS parity (CMakeLists.txt:73, exabrick.cu:614-618):
cells whose scalar equals EMPTY_CELL_POISON_VALUE are skipped in the
basis sum — they contribute neither weight nor value.  OFF by default,
like the reference."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from owlexabrick_tpu.core.constants import EMPTY_CELL_POISON_VALUE
from owlexabrick_tpu.oracle import reference as oracle
from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render.camera import Camera
from owlexabrick_tpu.render.dvr import (
    RenderConfig,
    locate_leaf,
    sample_basis,
    trace_dvr,
)
from owlexabrick_tpu.render.frame import make_frame_state
from owlexabrick_tpu.render.scene import to_device
from owlexabrick_tpu.render.slabs import (
    SlabConfig,
    build_level_grids,
    check_separable,
    permute_camera,
    principal_axis,
    render_slabs,
)

from conftest import EX2


def _poisoned_scene(amr_fixture, n_holes=8, seed=5):
    """EX2 (8^3 two-level gradient fixture) with a deterministic set of
    per-cell scalars replaced by the poison value."""
    lower, level, scal = amr_fixture(EX2)
    scal = np.asarray(scal, np.float32).copy()
    rng = np.random.default_rng(seed)
    holes = rng.choice(scal.shape[0], size=n_holes, replace=False)
    scal[holes] = EMPTY_CELL_POISON_VALUE
    scene, bricks, ids, regions, tree = scene_from_cells(
        lower, level, [scal]
    )
    return scene, bricks, holes


def test_sample_basis_skips_poison(amr_fixture):
    """sample_basis(allow_empty=True) == oracle sample_point with the
    poison skip, at probe points whose 8-corner stencils straddle holes."""
    scene, bricks, _ = _poisoned_scene(amr_fixture)
    dscene = to_device(scene)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.5, 7.5, (64, 3)).astype(np.float32)
    nodes = locate_leaf(dscene, jnp.asarray(pts))
    rids = np.asarray(dscene.tree_leaf)[np.asarray(nodes)]
    rc = jnp.asarray(np.clip(rids, 0, None))
    ok, val = sample_basis(dscene, rc, jnp.asarray(pts), 0,
                           allow_empty=True)
    ok = np.asarray(ok)
    val = np.asarray(val)
    ok_off, val_off = sample_basis(dscene, rc, jnp.asarray(pts), 0)
    n_diff = 0
    for i in range(pts.shape[0]):
        if rids[i] < 0:
            continue
        w_ok, w_val = oracle.sample_point(
            scene, int(rids[i]), pts[i], 0, allow_empty_cells=True
        )
        assert bool(ok[i]) == w_ok, i
        if w_ok:
            np.testing.assert_allclose(val[i], w_val, rtol=2e-5,
                                       atol=2e-5, err_msg=str(i))
        if w_ok and abs(float(val_off[i]) - w_val) > 1e-3:
            n_diff += 1
    # the flag must actually change values near the holes
    assert n_diff > 0


def test_dvr_poison_matches_oracle(amr_fixture):
    """Full DVR rays through the poisoned scene: jit wavefront with
    cfg.allow_empty_cells == the oracle's poison-skip path."""
    scene, bricks, _ = _poisoned_scene(amr_fixture)
    dscene = to_device(scene)
    size = 10
    cam = Camera.look_at(
        from_=[12.0, 10.0, 14.0], at=[4.0, 4.0, 4.0], up=[0, 1, 0],
        fovy_degrees=50.0, width=size, height=size,
    )
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7)
    o, d = cam.rays(size, size)
    cfg = RenderConfig(num_channels=1, allow_empty_cells=True)
    rgba = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d),
            jnp.zeros(o.shape[0]),
        )
    )
    for i in range(o.shape[0]):
        want = oracle.trace_dvr_ray(
            scene, fs, o[i], d[i], num_channels=1, allow_empty_cells=True
        )
        np.testing.assert_allclose(rgba[i], want, rtol=5e-3, atol=5e-3,
                                   err_msg=f"pixel {i}")


def test_level_grid_build_masks_holes(amr_fixture):
    """build_level_grids(allow_empty_cells=True): poisoned cells get mask
    0 and value 0; everything else is untouched."""
    scene, bricks, _ = _poisoned_scene(amr_fixture)
    g_on = build_level_grids(bricks, scene.scalars, axis=2, device=False,
                             allow_empty_cells=True)
    g_off = build_level_grids(bricks, scene.scalars, axis=2, device=False)
    n_holes = 0
    for li in range(len(g_on.levels)):
        m_on, m_off = g_on.masks[li], g_off.masks[li]
        v_on, v_off = g_on.vals[li], g_off.vals[li]
        hole = (v_off == np.float32(EMPTY_CELL_POISON_VALUE)
                ).all(axis=0) & (m_off > 0)
        n_holes += int(hole.sum())
        np.testing.assert_array_equal(m_on[hole], 0.0)
        np.testing.assert_array_equal(v_on[:, hole], 0.0)
        keep = ~hole
        np.testing.assert_array_equal(m_on[keep], m_off[keep])
        np.testing.assert_array_equal(v_on[:, keep], v_off[:, keep])
    assert n_holes > 0


def test_slab_sweep_poison_converges_to_wavefront(amr_fixture):
    """The slab fast path on hole-masked grids converges to the exact
    wavefront render with the poison skip (same integral, different
    quadrature) — the mask IS the basis-weight sum, so zeroing it is
    exactly the reference's notEmptyCell skip."""
    scene, bricks, _ = _poisoned_scene(amr_fixture)
    dscene = to_device(scene)
    grids = build_level_grids(bricks, scene.scalars, axis=2,
                              allow_empty_cells=True)
    size = 24
    cam = Camera.look_at(
        from_=[4.0, 4.0, 30.0], at=[4.0, 4.0, 4.0], up=[0, 1, 0],
        fovy_degrees=30.0, width=size, height=size,
    )
    axis = principal_axis(-np.asarray(cam.dir00) / np.linalg.norm(cam.dir00))
    assert axis == 2 and check_separable(cam, axis)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.05, opacity_scale=0.5)
    fs = jax.tree.map(jnp.asarray, fs)
    pos, dir00, du, dv = permute_camera(cam, axis)
    cfg = SlabConfig(num_channels=1, nslabs=256, chunk=32, flip=True)
    rgba_slab = np.asarray(
        jax.jit(render_slabs, static_argnames=("cfg", "width", "height"))(
            grids, fs, cfg, jnp.asarray(pos), jnp.asarray(dir00),
            jnp.asarray(du), jnp.asarray(dv), size, size,
        )
    )
    o, d = cam.rays(size, size)
    rgba_wf = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, fs, RenderConfig(num_channels=1, allow_empty_cells=True),
            jnp.asarray(o), jnp.asarray(d), jnp.zeros(o.shape[0]),
        )
    )
    rmse = np.sqrt(((rgba_slab - rgba_wf) ** 2).mean())
    assert rmse < 0.02, rmse
    assert rgba_wf[:, 3].max() > 0.2
