"""Sampler unit tests: basis weights, trilinear reproduction, continuity
across level boundaries, and jnp-vs-oracle agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlexabrick_tpu.oracle import reference as oracle
from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render.dvr import locate_leaf, sample_basis
from owlexabrick_tpu.render.scene import to_device

from conftest import EX2, EX3, EX4


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_cache():
    # Full-suite runs reproducibly segfaulted inside XLA's CPU
    # backend_compile_and_load when this module's locate_leaf compile
    # ran after ~120 accumulated prior-test compilations (the same
    # compile is clean in isolation or after any small prefix).
    # Resetting the trace/executable caches before the module sidesteps
    # the poisoned compiler state at the cost of a few recompiles.
    jax.clear_caches()
    yield


def _scene(amr_fixture, text):
    lower, level, scal = amr_fixture(text)
    scene, bricks, ids, regions, tree = scene_from_cells(lower, level, [scal])
    return scene, regions, tree


def _locate_np(tree_axis, tree_split, tree_child, tree_leaf, depth, p):
    node = 0
    for _ in range(depth + 1):
        if tree_axis[node] == 3:
            break
        node = tree_child[node] + (1 if p[tree_axis[node]] >= tree_split[node] else 0)
    return node


def _sample_oracle(scene, p):
    node = _locate_np(
        scene.tree_axis, scene.tree_split, scene.tree_child,
        scene.tree_leaf, 64, p,
    )
    rid = scene.tree_leaf[node]
    if rid < 0:
        return None
    ok, v = oracle.sample_point(scene, int(rid), np.asarray(p, np.float64), 0)
    return v if ok else None


def test_weights_sum_deep_inside(amr_fixture):
    """Deep inside a single uniform brick the tent weights sum to 1 and the
    sample reproduces trilinear interpolation of cell-center values."""
    scene, regions, tree = _scene(amr_fixture, EX2)
    dscene = to_device(scene)
    rng = np.random.default_rng(0)
    pts = rng.uniform(1.0, 7.0, (64, 3)).astype(np.float32)
    nodes = locate_leaf(dscene, jnp.asarray(pts))
    rids = np.asarray(dscene.tree_leaf)[np.asarray(nodes)]
    assert (rids >= 0).all()
    ok, val = sample_basis(dscene, jnp.asarray(rids), jnp.asarray(pts), 0)
    assert np.asarray(ok).all()

    # trilinear oracle on the 8^3 gradient: cell value at center (i+.5)
    # reproduces the generator's trilerp; interpolate manually
    scal = np.asarray(scene.scalars[0]).reshape(8, 8, 8)  # z,y,x

    def trilinear(p):
        q = p - 0.5
        i = np.floor(q).astype(int)
        f = q - i
        acc = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = (
                        (f[0] if dx else 1 - f[0])
                        * (f[1] if dy else 1 - f[1])
                        * (f[2] if dz else 1 - f[2])
                    )
                    acc += w * scal[i[2] + dz, i[1] + dy, i[0] + dx]
        return acc

    expect = np.array([trilinear(p) for p in pts])
    np.testing.assert_allclose(np.asarray(val), expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("text", [EX3, EX4])
def test_jnp_matches_oracle_samples(amr_fixture, text):
    scene, regions, tree = _scene(amr_fixture, text)
    dscene = to_device(scene)
    rng = np.random.default_rng(1)
    lo = regions.domain_lo.min(axis=0) + 0.01
    hi = regions.domain_hi.max(axis=0) - 0.01
    pts = rng.uniform(lo, hi, (128, 3)).astype(np.float32)
    nodes = np.asarray(locate_leaf(dscene, jnp.asarray(pts)))
    rids = np.asarray(dscene.tree_leaf)[nodes]
    mask = rids >= 0
    ok, val = sample_basis(
        dscene, jnp.asarray(np.clip(rids, 0, None)), jnp.asarray(pts), 0
    )
    ok = np.asarray(ok)
    val = np.asarray(val)
    for i, p in enumerate(pts):
        if not mask[i]:
            continue
        o_ok, o_val = oracle.sample_point(
            scene, int(rids[i]), np.asarray(p, np.float64), 0
        )
        assert o_ok == bool(ok[i])
        if o_ok:
            np.testing.assert_allclose(val[i], o_val, rtol=2e-4, atol=2e-4)


def test_continuity_across_level_boundary(amr_fixture):
    """The reconstruction must be continuous across the coarse/fine
    interface (the crack-free property, README.md:8-21)."""
    scene, regions, tree = _scene(amr_fixture, EX4)
    dscene = to_device(scene)
    # EX4: level-0 cells x in [0,4), level-1 region x in [4,8); interface x=4
    rng = np.random.default_rng(2)
    ys = rng.uniform(0.8, 1.5, 32)
    zs = rng.uniform(0.8, 1.5, 32)
    for y, z in zip(ys, zs):
        pa = np.array([4.0 - 1e-3, y, z], np.float32)
        pb = np.array([4.0 + 1e-3, y, z], np.float32)
        vals = []
        for p in (pa, pb):
            node = np.asarray(locate_leaf(dscene, jnp.asarray(p[None])))[0]
            rid = int(np.asarray(dscene.tree_leaf)[node])
            assert rid >= 0
            ok, v = sample_basis(
                dscene, jnp.asarray([rid]), jnp.asarray(p[None]), 0
            )
            assert bool(np.asarray(ok)[0])
            vals.append(float(np.asarray(v)[0]))
        assert abs(vals[0] - vals[1]) < 2e-2, (y, z, vals)


def test_gradient_matches_finite_difference(amr_fixture):
    scene, regions, tree = _scene(amr_fixture, EX2)
    dscene = to_device(scene)
    rng = np.random.default_rng(3)
    pts = rng.uniform(2.0, 6.0, (16, 3)).astype(np.float32)
    nodes = np.asarray(locate_leaf(dscene, jnp.asarray(pts)))
    rids = np.asarray(dscene.tree_leaf)[nodes]
    ok, val, grad = sample_basis(
        dscene, jnp.asarray(rids), jnp.asarray(pts), 0, need_grad=True
    )
    grad = np.asarray(grad)
    # analytic gradient direction vs central differences of the value field
    eps = 1e-3
    for i, p in enumerate(pts):
        g_fd = np.zeros(3)
        for a in range(3):
            for s, sign in ((eps, 1), (-eps, -1)):
                q = p.copy()
                q[a] += s
                node = np.asarray(locate_leaf(dscene, jnp.asarray(q[None])))[0]
                rid = int(np.asarray(dscene.tree_leaf)[node])
                _, v = sample_basis(
                    dscene, jnp.asarray([rid]), jnp.asarray(q[None]), 0
                )
                g_fd[a] += sign * float(np.asarray(v)[0])
        g_fd /= 2 * eps
        ga = grad[i] / (np.linalg.norm(grad[i]) + 1e-20)
        gf = g_fd / (np.linalg.norm(g_fd) + 1e-20)
        assert float(ga @ gf) > 0.99, (p, ga, gf)
