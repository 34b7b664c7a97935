"""Randomized property tests: random octree AMR configurations through
builder -> regions -> sampler, checking the structural invariants the
reference enforces with runtime asserts (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def random_amr(seed: int, root_n: int = 4, max_level: int = 3,
               p_split: float = 0.4):
    """Generate a valid AMR cell set by random octree subdivision of a
    root_n^3 grid of level-(max_level) cells."""
    rng = np.random.default_rng(seed)
    lowers, levels = [], []

    def subdivide(lo, level):
        if level > 0 and rng.random() < p_split:
            cw = 1 << (level - 1)
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        subdivide(
                            (lo[0] + dx * cw, lo[1] + dy * cw,
                             lo[2] + dz * cw), level - 1,
                        )
        else:
            lowers.append(lo)
            levels.append(level)

    w = 1 << max_level
    for z in range(root_n):
        for y in range(root_n):
            for x in range(root_n):
                if rng.random() < 0.85:  # leave some holes
                    subdivide((x * w, y * w, z * w), max_level)
    lower = np.asarray(lowers, np.int32)
    level = np.asarray(levels, np.int32)
    values = rng.uniform(0, 1, lower.shape[0]).astype(np.float32)
    return lower, level, values


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_random_amr_pipeline_invariants(seed):
    from owlexabrick_tpu.builder.bricker import Bricker
    from owlexabrick_tpu.pipeline import bricks_from_build
    from owlexabrick_tpu.regions.build import build_regions

    lower, level, values = random_amr(seed)
    res = Bricker(lower, level).build()

    # builder invariants: exact cover, single level per brick
    seen = np.zeros(lower.shape[0], bool)
    for b in res.bricks:
        ids = b.cell_ids.reshape(-1)
        assert (ids >= 0).all()
        assert not seen[ids].any()
        seen[ids] = True
        assert (level[ids] == b.level).all()
    assert seen.all()

    bricks, cell_ids = bricks_from_build(res)
    scalars = values[cell_ids][None]
    regions, tree = build_regions(bricks, scalars)

    # region invariants: total region volume == union of brick domains
    # (regions tile the domain; the BSP guarantees disjointness)
    dlo, dhi = bricks.domains()
    r_vol = np.prod(regions.domain_hi - regions.domain_lo, axis=1).sum()
    # union volume via fine rasterization on a half-cell lattice
    g_lo = dlo.min(axis=0)
    g_hi = dhi.max(axis=0)
    step = 0.5
    dims = np.round((g_hi - g_lo) / step).astype(int)
    occ = np.zeros(dims[::-1], bool)
    for i in range(bricks.num_bricks):
        a = np.round((dlo[i] - g_lo) / step).astype(int)
        b = np.round((dhi[i] - g_lo) / step).astype(int)
        occ[a[2]:b[2], a[1]:b[1], a[0]:b[0]] = True
    union_vol = occ.sum() * step**3
    np.testing.assert_allclose(r_vol, union_vol, rtol=1e-5)

    # region value range is bounded by the union of its bricks' ranges
    for r in range(min(regions.num_regions, 64)):
        lo_b, hi_b = np.inf, -np.inf
        for bid in regions.brick_ids[r]:
            if bid < 0:
                continue
            beg = int(bricks.begin[bid])
            n = int(np.prod(bricks.size[bid]))
            vals = scalars[0, beg : beg + n]
            lo_b = min(lo_b, float(vals.min()))
            hi_b = max(hi_b, float(vals.max()))
        assert regions.value_range[r][0] >= lo_b - 1e-5
        assert regions.value_range[r][1] <= hi_b + 1e-5
        assert regions.value_range[r][0] <= regions.value_range[r][1]


@pytest.mark.parametrize("seed", [7, 8])
def test_random_amr_sampler_continuity(seed):
    """The reconstruction is continuous: random nearby point pairs have
    values within Lipschitz bound of the field scale."""
    from owlexabrick_tpu.pipeline import scene_from_cells
    from owlexabrick_tpu.render.dvr import locate_leaf, sample_basis
    from owlexabrick_tpu.render.scene import to_device

    lower, level, values = random_amr(seed)
    scene, *_ = scene_from_cells(lower, level, [values])
    dscene = to_device(scene)
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.region_lo).min(0)
    hi = np.asarray(scene.region_hi).max(0)
    p0 = rng.uniform(lo, hi, (256, 3)).astype(np.float32)
    eps = 1e-3
    p1 = p0 + rng.uniform(-eps, eps, p0.shape).astype(np.float32)

    def sample(p):
        node = locate_leaf(dscene, jnp.asarray(p))
        rid = np.asarray(dscene.tree_leaf)[np.asarray(node)]
        ok, v = sample_basis(
            dscene, jnp.asarray(np.clip(rid, 0, None)), jnp.asarray(p), 0
        )
        return (np.asarray(ok) & (rid >= 0)), np.asarray(v)

    ok0, v0 = sample(p0)
    ok1, v1 = sample(p1)
    both = ok0 & ok1
    # valid neighbours: values continuous (field range is [0,1], cells
    # width >= 1 -> |df| <= ~3 eps per unit)
    assert (np.abs(v0[both] - v1[both]) < 0.05).all()


@pytest.mark.parametrize("seed", [11, 12])
def test_random_amr_render_paths_agree(seed):
    """Wavefront and slab paths agree on random AMR scenes."""
    from owlexabrick_tpu.builder.bricker import build_bricks
    from owlexabrick_tpu.pipeline import bricks_from_build, scene_from_cells
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.dvr import RenderConfig, trace_dvr
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.scene import to_device
    from owlexabrick_tpu.render.slabs import (
        SlabConfig,
        build_level_grids,
        render_slabs_camera,
    )

    lower, level, values = random_amr(seed)
    scene, bricks, ids, *_ = scene_from_cells(lower, level, [values])
    grids = build_level_grids(bricks, scene.scalars, axis=2)

    size = 16
    c = 0.5 * (np.asarray(scene.voxel_bounds_lo)
               + np.asarray(scene.voxel_bounds_hi))
    eye = c.copy()
    eye[2] = float(scene.voxel_bounds_hi[2]) * 2.5 + 8
    cam = Camera.look_at(eye, c, [0, 1, 0], 30.0, size, size)
    fs = jax.tree.map(
        jnp.asarray,
        make_frame_state(cam, 1, [[0.0, 1.0]], dt=0.05, opacity_scale=0.5),
    )
    rgba_s = np.asarray(
        render_slabs_camera(
            grids, fs, SlabConfig(nslabs=512, chunk=32), cam, size, size
        )
    )
    o, d = cam.rays(size, size)
    rgba_w = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            to_device(scene), fs, RenderConfig(),
            jnp.asarray(o), jnp.asarray(d), jnp.zeros(o.shape[0]),
        )
    )
    rmse = np.sqrt(((rgba_s - rgba_w) ** 2).mean())
    assert rmse < 0.03, rmse
