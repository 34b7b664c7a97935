"""Native (C++) builder/regions must match the numpy implementations."""

import numpy as np
import pytest

from owlexabrick_tpu.builder.bricker import (
    SAH_ALIKE,
    SMALL_BRICK_COUNT,
    SPATIAL_MEDIAN,
)
from owlexabrick_tpu.builder.bricker import Bricker


def build_bricks(lower, level, strategy=SAH_ALIKE, max_leaf_width=127):
    # the python spec implementation, explicitly (the dispatcher would
    # pick the native backend we are comparing against)
    return Bricker(lower, level, strategy, max_leaf_width).build()
from owlexabrick_tpu.pipeline import bricks_from_build
from owlexabrick_tpu.regions.build import build_regions_py as build_regions

from conftest import EX1, EX2, EX3, EX4

native = pytest.importorskip("owlexabrick_tpu.native")
if not native.available():  # pragma: no cover
    pytest.skip("native library not buildable", allow_module_level=True)


@pytest.mark.parametrize("text", [EX1, EX2, EX3, EX4])
@pytest.mark.parametrize(
    "strategy", [SPATIAL_MEDIAN, SAH_ALIKE, SMALL_BRICK_COUNT]
)
def test_native_bricks_match_python(amr_fixture, text, strategy):
    lower, level, _ = amr_fixture(text)
    py = build_bricks(lower, level, strategy=strategy)
    nt = native.native_build_bricks(lower, level, strategy=strategy)
    assert len(py.bricks) == len(nt.bricks)
    for a, b in zip(py.bricks, nt.bricks):
        np.testing.assert_array_equal(a.lower, b.lower)
        np.testing.assert_array_equal(a.size, b.size)
        assert a.level == b.level
        np.testing.assert_array_equal(a.cell_ids, b.cell_ids)
    assert len(py.kd) == len(nt.kd)
    for a, b in zip(py.kd, nt.kd):
        assert a.axis == b.axis
        if a.axis == 3:
            assert a.first_prim == b.first_prim
        else:
            assert (a.split, a.first_child, a.max_level) == (
                b.split, b.first_child, b.max_level,
            )


@pytest.mark.parametrize("text", [EX2, EX3, EX4])
def test_native_regions_match_python(amr_fixture, text):
    lower, level, scal = amr_fixture(text)
    res = build_bricks(lower, level)
    bricks, ids = bricks_from_build(res)
    scalars = scal[ids][None]
    r_py, t_py = build_regions(bricks, scalars)
    r_nt, t_nt = native.native_build_regions(bricks, scalars)

    np.testing.assert_allclose(r_nt.domain_lo, r_py.domain_lo)
    np.testing.assert_allclose(r_nt.domain_hi, r_py.domain_hi)
    np.testing.assert_array_equal(r_nt.leaf_list, r_py.leaf_list)
    np.testing.assert_array_equal(r_nt.leaf_begin, r_py.leaf_begin)
    np.testing.assert_array_equal(r_nt.brick_ids, r_py.brick_ids)
    np.testing.assert_allclose(r_nt.finest_cw, r_py.finest_cw)
    np.testing.assert_allclose(r_nt.value_range, r_py.value_range, rtol=1e-6)

    np.testing.assert_array_equal(t_nt.axis, t_py.axis)
    np.testing.assert_allclose(t_nt.split, t_py.split)
    np.testing.assert_array_equal(t_nt.child, t_py.child)
    np.testing.assert_array_equal(t_nt.leaf, t_py.leaf)
    np.testing.assert_allclose(t_nt.node_lo, t_py.node_lo)
    np.testing.assert_allclose(t_nt.node_hi, t_py.node_hi)
    assert t_nt.depth == t_py.depth


def test_native_regions_speed_parity_medium():
    """Medium synthetic scene: native must agree with numpy and be fast."""
    import time

    from owlexabrick_tpu.bench_scene import synthetic_volume
    from owlexabrick_tpu.tools.raw2cells import volume_to_cells

    vol = synthetic_volume(32)
    lower, level, scal = volume_to_cells(vol, 0.004, 3)
    res = build_bricks(lower, level)
    bricks, ids = bricks_from_build(res)
    scalars = scal[ids][None]

    t0 = time.time()
    r_nt, t_nt = native.native_build_regions(bricks, scalars)
    dt_native = time.time() - t0
    t0 = time.time()
    r_py, t_py = build_regions(bricks, scalars)
    dt_py = time.time() - t0

    np.testing.assert_array_equal(r_nt.leaf_list, r_py.leaf_list)
    np.testing.assert_allclose(r_nt.value_range, r_py.value_range, rtol=1e-5)
    assert dt_native < dt_py, (dt_native, dt_py)
    print(f"native {dt_native:.2f}s vs python {dt_py:.2f}s")


def test_native_flat_bricks_match_object_path():
    """native_build_bricks_flat must produce exactly the Bricks/cell_ids
    that build_bricks + bricks_from_build produce (it skips the
    per-brick Python object round trip for scale builds)."""
    import numpy as np
    import pytest

    from owlexabrick_tpu.native import available, native_build_bricks_flat
    from owlexabrick_tpu.builder.bricker import build_bricks
    from owlexabrick_tpu.pipeline import bricks_from_build
    from owlexabrick_tpu.bench_scene import exajet_pattern_cells

    if not available():
        pytest.skip("native core unavailable")
    lower, level, _ = exajet_pattern_cells(32)
    res = build_bricks(lower, level)
    b_ref, ids_ref = bricks_from_build(res)
    b_flat, ids_flat = native_build_bricks_flat(lower, level)
    np.testing.assert_array_equal(b_ref.lower, b_flat.lower)
    np.testing.assert_array_equal(b_ref.size, b_flat.size)
    np.testing.assert_array_equal(b_ref.level, b_flat.level)
    np.testing.assert_array_equal(b_ref.begin, b_flat.begin)
    np.testing.assert_array_equal(ids_ref, ids_flat)
