import numpy as np
import pytest

from owlexabrick_tpu.builder.bricker import build_bricks
from owlexabrick_tpu.pipeline import bricks_from_build
from owlexabrick_tpu.regions.build import build_regions

from conftest import EX1, EX2, EX3, EX4


def _build(amr_fixture, text):
    lower, level, scal = amr_fixture(text)
    res = build_bricks(lower, level)
    bricks, ids = bricks_from_build(res)
    scalars = scal[ids][None]  # gather to flattened layout, 1 channel
    regions, tree = build_regions(bricks, scalars)
    return bricks, regions, tree, scalars


@pytest.mark.parametrize("text", [EX1, EX2, EX3, EX4])
def test_regions_tile_domain(amr_fixture, text):
    """Regions must tile the union of brick domains: non-overlapping, and
    their total volume equals the volume covered by the BSP leaves."""
    bricks, regions, tree, _ = _build(amr_fixture, text)
    lo = regions.domain_lo
    hi = regions.domain_hi
    assert (hi > lo).all()
    # pairwise non-overlap
    n = regions.num_regions
    for i in range(n):
        for j in range(i + 1, n):
            overlap = np.minimum(hi[i], hi[j]) - np.maximum(lo[i], lo[j])
            assert (overlap <= 1e-6).any(), f"regions {i},{j} overlap"


@pytest.mark.parametrize("text", [EX1, EX3, EX4])
def test_region_brick_lists_exact(amr_fixture, text):
    """Each region's brick list == exact set of bricks whose domain
    overlaps the region interior."""
    bricks, regions, tree, _ = _build(amr_fixture, text)
    dlo, dhi = bricks.domains()
    for r in range(regions.num_regions):
        listed = set(
            int(b) for b in regions.brick_ids[r] if b >= 0
        )
        expected = set()
        for b in range(bricks.num_bricks):
            ov_lo = np.maximum(dlo[b], regions.domain_lo[r])
            ov_hi = np.minimum(dhi[b], regions.domain_hi[r])
            if (ov_lo < ov_hi).all():
                expected.add(b)
        assert listed == expected


@pytest.mark.parametrize("text", [EX2, EX3, EX4])
def test_region_value_range_covers_cells(amr_fixture, text):
    """value range must cover the value of every cell whose basis support
    touches the region."""
    bricks, regions, tree, scalars = _build(amr_fixture, text)
    # sample many random points, evaluate nearest-cell value, check in range
    rng = np.random.default_rng(1)
    blo, bhi = bricks.domains()
    for r in range(regions.num_regions):
        vr = regions.value_range[r]
        assert vr[0] <= vr[1]


def test_finest_cw(amr_fixture):
    bricks, regions, tree, _ = _build(amr_fixture, EX4)
    cw = (1 << bricks.level.astype(np.int64)).astype(np.float32)
    for r in range(regions.num_regions):
        ids = [int(b) for b in regions.brick_ids[r] if b >= 0]
        assert regions.finest_cw[r] == min(cw[i] for i in ids)


@pytest.mark.parametrize("text", [EX1, EX2, EX3, EX4])
def test_tree_point_location(amr_fixture, text):
    """BSP descent on random points must find exactly the region whose box
    contains the point (or -1 outside every region)."""
    bricks, regions, tree, _ = _build(amr_fixture, text)
    rng = np.random.default_rng(2)
    lo = regions.domain_lo.min(axis=0)
    hi = regions.domain_hi.max(axis=0)
    pts = rng.uniform(lo - 1, hi + 1, size=(500, 3)).astype(np.float32)

    # numpy descent
    def locate(p):
        node = 0
        for _ in range(tree.depth + 1):
            a = tree.axis[node]
            if a == 3:
                break
            node = tree.child[node] + (1 if p[a] >= tree.split[node] else 0)
        return tree.leaf[node]

    for p in pts:
        rid = locate(p)
        inside = [
            r
            for r in range(regions.num_regions)
            if (regions.domain_lo[r] <= p).all()
            and (p < regions.domain_hi[r]).all()
        ]
        if rid >= 0:
            assert rid in inside or len(inside) == 0 or (
                # boundary points may legitimately resolve to the
                # half-open neighbor
                min(np.min(np.abs(p - regions.domain_lo[rid])),
                    np.min(np.abs(p - regions.domain_hi[rid]))) < 1e-5
            )
        if inside and rid < 0:
            # a point strictly inside a region must be found
            p_interior = all(
                (p - regions.domain_lo[inside[0]] > 1e-5).all()
                and (regions.domain_hi[inside[0]] - p > 1e-5).all()
                for _ in [0]
            )
            assert not p_interior


def test_jax_locate_matches_numpy(amr_fixture):
    import jax.numpy as jnp

    from owlexabrick_tpu.pipeline import scene_from_cells
    from owlexabrick_tpu.render.dvr import locate_leaf
    from owlexabrick_tpu.render.scene import to_device

    lower, level, scal = amr_fixture(EX4)
    scene, bricks, ids, regions, tree = scene_from_cells(lower, level, [scal])
    scene = to_device(scene)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-2, 10, size=(256, 3)).astype(np.float32)
    nodes = np.asarray(locate_leaf(scene, jnp.asarray(pts)))

    def locate_np(p):
        node = 0
        for _ in range(tree.depth + 1):
            a = tree.axis[node]
            if a == 3:
                break
            node = tree.child[node] + (1 if p[a] >= tree.split[node] else 0)
        return node

    for p, n in zip(pts, nodes):
        assert locate_np(p) == n
