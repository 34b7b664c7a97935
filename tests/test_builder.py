import numpy as np
import pytest

from owlexabrick_tpu.builder.bricker import (
    SAH_ALIKE,
    SMALL_BRICK_COUNT,
    SPATIAL_MEDIAN,
    build_bricks,
    deduplicate_cells,
)

from conftest import EX0, EX1, EX2, EX3, EX4


def _check_invariants(lower, level, result, max_leaf_width=127):
    """Builder postconditions: every cell in exactly one brick slot, leaves
    single-level, <= max width, fully populated."""
    seen = np.zeros(lower.shape[0], bool)
    for b in result.bricks:
        assert b.cell_ids.shape == tuple(b.size[::-1])
        assert (b.size <= max_leaf_width).all()
        ids = b.cell_ids.reshape(-1)
        assert (ids >= 0).all(), "bricks must be fully populated"
        assert not seen[ids].any(), "cell assigned to two bricks"
        seen[ids] = True
        # all cells in a brick share the brick's level & land on its lattice
        assert (level[ids] == b.level).all()
        cw = 1 << b.level
        rel = lower[ids] - b.lower
        assert (rel % cw == 0).all()
        assert (rel // cw < b.size).all() and (rel >= 0).all()
    assert seen.all(), "every (deduped) cell must be covered"


@pytest.mark.parametrize("text", [EX0, EX1, EX2, EX3, EX4])
@pytest.mark.parametrize(
    "strategy", [SPATIAL_MEDIAN, SAH_ALIKE, SMALL_BRICK_COUNT]
)
def test_builder_invariants(amr_fixture, text, strategy):
    lower, level, _ = amr_fixture(text)
    res = build_bricks(lower, level, strategy=strategy)
    _check_invariants(lower, level, res)


def test_single_cell(amr_fixture):
    lower, level, _ = amr_fixture(EX0)
    res = build_bricks(lower, level)
    assert len(res.bricks) == 1
    b = res.bricks[0]
    assert (b.size == 1).all() and b.level == 0


def test_uniform_grid_one_brick(amr_fixture):
    lower, level, _ = amr_fixture(EX2)
    res = build_bricks(lower, level)
    assert len(res.bricks) == 1
    assert (res.bricks[0].size == 8).all()


def test_two_level_split(amr_fixture):
    lower, level, _ = amr_fixture(EX4)
    res = build_bricks(lower, level)
    levels = sorted(b.level for b in res.bricks)
    assert 0 in levels and 1 in levels


def test_max_leaf_width():
    n = 16
    iz, iy, ix = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    lower = np.stack([ix.ravel(), iy.ravel(), iz.ravel()], 1)
    level = np.zeros(n**3, np.int32)
    res = build_bricks(lower, level, max_leaf_width=4)
    _check_invariants(lower, level, res, max_leaf_width=4)
    assert len(res.bricks) == (n // 4) ** 3


def test_dedup_finer_wins():
    lower = np.array([[0, 0, 0], [0, 0, 0], [2, 0, 0]], np.int32)
    level = np.array([1, 0, 1], np.int32)
    keep = deduplicate_cells(lower, level)
    kept = set(map(tuple, np.c_[lower[keep], level[keep]]))
    assert (0, 0, 0, 0) in kept  # finer level survives
    assert (0, 0, 0, 1) not in kept
    assert (2, 0, 0, 1) in kept


def test_kd_tree_structure(amr_fixture):
    lower, level, _ = amr_fixture(EX4)
    res = build_bricks(lower, level)
    kd = res.kd
    # leaves reference bricks, inner nodes have valid children
    n_leaves = sum(1 for n in kd if n.axis == 3)
    assert n_leaves == len(res.bricks)
    for n in kd:
        if n.axis != 3:
            assert 0 < n.first_child < len(kd)
            assert 0 <= n.axis < 3


def test_kd_file_roundtrip(tmp_path, amr_fixture):
    from owlexabrick_tpu.builder.bricker import kd_to_arrays
    from owlexabrick_tpu.io import formats

    lower, level, _ = amr_fixture(EX3)
    res = build_bricks(lower, level)
    axis, word0, lo30, max_level = kd_to_arrays(res.kd)
    packed = formats.pack_kd_nodes(axis, word0, lo30, max_level)
    assert packed.nbytes == 12 * len(res.kd)
    p = str(tmp_path / "t.kd")
    formats.write_kd(p, packed)
    back = formats.read_kd(p)
    np.testing.assert_array_equal(back["axis"], axis)
    np.testing.assert_array_equal(back["word0"], word0)
    np.testing.assert_array_equal(back["lo30"], lo30)
    np.testing.assert_array_equal(back["max_level"], max_level)
