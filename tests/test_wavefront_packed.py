"""Row-packed wavefront golden tests: trace_dvr_packed and its
primitives must reproduce the classic gather path (locate_leaf +
sample_basis + trace_dvr) — same traversal, same quadrature; values may
differ only by float32 summation order."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from owlexabrick_tpu.render.slabs import build_level_grids
from owlexabrick_tpu.render.wavefront import (
    build_pack,
    locate_packed,
    sample_packed,
    trace_dvr_packed,
)
from owlexabrick_tpu.tools.artificial import parse_grids_text

from conftest import EX2, EX3, EX4


def _setup(text, channels=1):
    lower, level, scal = parse_grids_text(text)
    scene, bricks, *_ = scene_from_cells(
        lower, level, [scal * (c + 1.0) for c in range(channels)]
    )
    dscene = to_device(scene)
    grids = build_level_grids(bricks, scene.scalars, axis=2)
    pack = build_pack(dscene, grids)
    return scene, dscene, pack


@pytest.mark.parametrize("text", [EX2, EX3, EX4])
def test_locate_packed_matches_locate_leaf(text):
    scene, dscene, pack = _setup(text)
    rng = np.random.default_rng(0)
    lo = np.asarray(scene.region_lo).min(0)
    hi = np.asarray(scene.region_hi).max(0)
    pts = rng.uniform(lo - 0.4, hi + 0.4, (512, 3)).astype(np.float32)

    node = locate_leaf(dscene, jnp.asarray(pts))
    rid_ref = np.asarray(dscene.tree_leaf)[np.asarray(node)]
    lo_ref = np.asarray(dscene.tree_lo)[np.asarray(node)]
    hi_ref = np.asarray(dscene.tree_hi)[np.asarray(node)]

    rid, plo, phi = jax.jit(locate_packed, static_argnames=())(
        pack, jnp.asarray(pts)
    )
    np.testing.assert_array_equal(np.asarray(rid), rid_ref)
    np.testing.assert_allclose(np.asarray(plo), lo_ref, atol=0)
    np.testing.assert_allclose(np.asarray(phi), hi_ref, atol=0)


@pytest.mark.parametrize("text", [EX2, EX3, EX4])
def test_sample_packed_matches_sample_basis(text):
    scene, dscene, pack = _setup(text)
    rng = np.random.default_rng(1)
    lo = np.asarray(scene.region_lo).min(0) + 1e-3
    hi = np.asarray(scene.region_hi).max(0) - 1e-3
    pts = rng.uniform(lo, hi, (512, 3)).astype(np.float32)

    node = locate_leaf(dscene, jnp.asarray(pts))
    rid = np.asarray(dscene.tree_leaf)[np.asarray(node)]
    ok_ref, v_ref = sample_basis(
        dscene, jnp.asarray(np.clip(rid, 0, None)), jnp.asarray(pts), 0
    )
    ok_ref = np.asarray(ok_ref) & (rid >= 0)

    ok, v = jax.jit(sample_packed, static_argnames=("channel",))(
        pack, jnp.asarray(pts), channel=0
    )
    ok = np.asarray(ok)
    sel = ok_ref  # compare where the region sampler is valid
    np.testing.assert_array_equal(ok[sel], True)
    np.testing.assert_allclose(
        np.asarray(v)[sel], np.asarray(v_ref)[sel], rtol=2e-5, atol=2e-6
    )


def test_sample_packed_multichannel():
    scene, dscene, pack = _setup(EX3, channels=2)
    rng = np.random.default_rng(2)
    lo = np.asarray(scene.region_lo).min(0) + 0.2
    hi = np.asarray(scene.region_hi).max(0) - 0.2
    pts = rng.uniform(lo, hi, (128, 3)).astype(np.float32)
    ok0, v0 = sample_packed(pack, jnp.asarray(pts), 0)
    ok1, v1 = sample_packed(pack, jnp.asarray(pts), 1)
    sel = np.asarray(ok0)
    np.testing.assert_allclose(
        np.asarray(v1)[sel], 2.0 * np.asarray(v0)[sel], rtol=1e-5
    )


@pytest.mark.parametrize("text,frm", [
    (EX2, [4.0, 4.0, 30.0]),
    (EX3, [20.0, 12.0, 25.0]),   # oblique camera
    (EX4, [-8.0, 3.0, 11.0]),
])
def test_trace_dvr_packed_matches_trace_dvr(text, frm):
    scene, dscene, pack = _setup(text)
    size = 24
    cam = Camera.look_at(frm, [4.0, 2.0, 2.0], [0, 1, 0], 45.0, size, size)
    fs = jax.tree.map(
        jnp.asarray,
        make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.3, opacity_scale=0.6),
    )
    cfg = RenderConfig(num_channels=1)
    o, d = cam.rays(size, size)
    offset = jnp.full(size * size, 0.5, jnp.float32)

    ref = np.asarray(jax.jit(trace_dvr, static_argnames="cfg")(
        dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d), offset
    ))
    got = np.asarray(jax.jit(trace_dvr_packed, static_argnames="cfg")(
        pack, dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d), offset
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_compacted_matches_packed_bitwise():
    """The binned/compacted orchestrator runs the same per-ray op
    sequence as the one-shot packed integrator; outputs agree to float
    reassociation noise (XLA codegen varies with the static batch
    size), far below display precision."""
    from owlexabrick_tpu.render.wavefront import trace_dvr_packed_compacted

    scene, dscene, pack = _setup(EX3)
    size = 24
    cam = Camera.look_at([14.0, 11.0, 17.0], [4.0, 2.0, 2.0], [0, 1, 0],
                         45.0, size, size)
    fs = jax.tree.map(
        jnp.asarray,
        make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.3, opacity_scale=0.6),
    )
    cfg = RenderConfig(num_channels=1)
    o, d = cam.rays(size, size)
    offset = jnp.full(size * size, 0.5, jnp.float32)
    a = np.asarray(jax.jit(
        trace_dvr_packed, static_argnames="cfg"
    )(pack, dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d), offset))
    b = np.asarray(trace_dvr_packed_compacted(
        pack, dscene, fs, cfg, jnp.asarray(o), jnp.asarray(d), offset,
        round_iters=2, min_size=16,
    ))
    assert a[:, 3].max() > 0.3
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)
