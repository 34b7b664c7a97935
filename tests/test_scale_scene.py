"""Scale-scene machinery: the streaming cell generator must be
bit-identical to the dense-volume path, and the two-wing field must
produce the exajet level-population pattern (fine cells hugging the
sheets, coarse background)."""

import numpy as np

from owlexabrick_tpu.bench_scene import (
    exajet_pattern_cells,
    exajet_pattern_volume,
)
from owlexabrick_tpu.tools.raw2cells import volume_to_cells


def _sorted(lo, lv, sc):
    key = np.lexsort((lo[:, 0], lo[:, 1], lo[:, 2], lv))
    return lo[key], lv[key], sc[key]


def test_streaming_cells_match_dense_volume():
    for wings in (1, 2):
        lo_a, lv_a, sc_a = volume_to_cells(
            exajet_pattern_volume(64, wings=wings), 0.004, 3
        )
        lo_b, lv_b, sc_b = exajet_pattern_cells(64, wings=wings)
        a = _sorted(lo_a, lv_a, sc_a)
        b = _sorted(lo_b, lv_b, sc_b)
        assert np.array_equal(a[0], b[0])
        assert np.array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])


def test_two_wings_have_exajet_pattern():
    lo, lv, sc = exajet_pattern_cells(64, wings=2)
    counts = np.bincount(lv)
    # finest level dominates the cell count but covers a thin y band
    assert counts[0] > 0.5 * lv.size
    fine = lo[lv == 0]
    y_span = fine[:, 1].max() - fine[:, 1].min()
    assert y_span < 64  # hugs the sheets, not the whole volume
    # two wings substantially grow the fine-cell population (at 64^3 the
    # refinement bands partially merge; the factor approaches 2 as the
    # sheets thin out relative to the domain at scale)
    lo1, lv1, _ = exajet_pattern_cells(64, wings=1)
    n1 = int((lv1 == 0).sum())
    assert counts[0] > 1.4 * n1


def test_cells_partition_is_exact():
    """Every finest-lattice point is covered by exactly one cell."""
    n = 32
    lo, lv, sc = exajet_pattern_cells(n)
    cover = np.zeros((n, n, n), np.int32)
    for (x, y, z), L in zip(lo, lv):
        w = 1 << L
        cover[z : z + w, y : y + w, x : x + w] += 1
    assert (cover == 1).all()
