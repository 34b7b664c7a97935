import numpy as np
import pytest

from owlexabrick_tpu.io import formats
from owlexabrick_tpu.io.expression import evaluate_postfix


def test_cells_roundtrip(tmp_path):
    lower = np.array([[0, 0, 0], [1, 2, 3], [-4, 5, -6]], np.int32)
    level = np.array([0, 1, 2], np.int32)
    p = str(tmp_path / "t.cells")
    formats.write_cells(p, lower, level)
    lo2, lv2 = formats.read_cells(p)
    np.testing.assert_array_equal(lo2, lower)
    np.testing.assert_array_equal(lv2, level)


def test_scalars_roundtrip(tmp_path):
    v = np.linspace(-1, 1, 17).astype(np.float32)
    p = str(tmp_path / "t.scalars")
    formats.write_scalars(p, v)
    np.testing.assert_array_equal(formats.read_scalars(p), v)


def test_bricks_roundtrip(tmp_path):
    p = str(tmp_path / "t.bricks")
    formats.write_bricks(
        p,
        lower=[[0, 0, 0], [2, 0, 0]],
        size=[[2, 1, 1], [1, 1, 1]],
        level=[0, 1],
        cell_ids_per_brick=[np.array([0, 1]), np.array([2])],
    )
    bricks, ids = formats.read_bricks(p)
    assert bricks.num_bricks == 2
    np.testing.assert_array_equal(bricks.lower, [[0, 0, 0], [2, 0, 0]])
    np.testing.assert_array_equal(bricks.size, [[2, 1, 1], [1, 1, 1]])
    np.testing.assert_array_equal(bricks.level, [0, 1])
    np.testing.assert_array_equal(bricks.begin, [0, 2])
    np.testing.assert_array_equal(ids, [0, 1, 2])


def test_bricks_rejects_bad_cellid(tmp_path):
    # IDs below the ALLOW_EMPTY_CELLS sentinel (-1) are corrupt
    p = str(tmp_path / "t.bricks")
    formats.write_bricks(
        p, lower=[[0, 0, 0]], size=[[1, 1, 1]], level=[0],
        cell_ids_per_brick=[np.array([-2])],
    )
    with pytest.raises(ValueError):
        formats.read_bricks(p)

    # IDs >= the deduped brick total are legitimate (duplicate removal
    # keeps ORIGINAL .scalars indices, builder.cpp:301-351) — the hard
    # bound is the scalar file length, enforced at gather time
    from owlexabrick_tpu.render.scene import gather_scalars
    from owlexabrick_tpu.core.types import ScalarField

    p2 = str(tmp_path / "t2.bricks")
    formats.write_bricks(
        p2, lower=[[0, 0, 0]], size=[[1, 1, 1]], level=[0],
        cell_ids_per_brick=[np.array([5])],
    )
    _, ids = formats.read_bricks(p2)  # loads with a note, no raise
    with pytest.raises(ValueError):
        gather_scalars(ids, [ScalarField.from_values(
            "f", np.zeros(3, np.float32))])


def test_tris_roundtrip(tmp_path):
    from owlexabrick_tpu.core.types import TriangleMesh

    m = TriangleMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        indices=np.array([[0, 1, 2]], np.int32),
    )
    p = str(tmp_path / "t.tris")
    formats.write_tris(p, [m, m])
    out = formats.read_tris(p)
    assert len(out) == 2
    np.testing.assert_array_equal(out[1].vertices, m.vertices)
    np.testing.assert_array_equal(out[1].indices, m.indices)


def test_brick_domains():
    from owlexabrick_tpu.core.types import Bricks

    b = Bricks(
        lower=np.array([[0, 0, 0]], np.int32),
        size=np.array([[2, 2, 2]], np.int32),
        level=np.array([1], np.int32),
        begin=np.array([0], np.int32),
    )
    lo, hi = b.bounds()
    np.testing.assert_allclose(lo[0], [0, 0, 0])
    np.testing.assert_allclose(hi[0], [4, 4, 4])
    dlo, dhi = b.domains()
    np.testing.assert_allclose(dlo[0], [-1, -1, -1])
    np.testing.assert_allclose(dhi[0], [5, 5, 5])


# ---------------------------------------------------------------------------
# expression fields
# ---------------------------------------------------------------------------

def test_expression_basic():
    f0 = np.array([1.0, 2.0, 3.0], np.float32)
    f1 = np.array([4.0, 5.0, 6.0], np.float32)
    out = evaluate_postfix(["%0", "%1", "+"], [f0, f1])
    np.testing.assert_allclose(out, [5, 7, 9])


def test_expression_select_and_compare():
    f0 = np.array([1.0, 5.0], np.float32)
    # f0 > 2 ? f0 : -1
    out = evaluate_postfix(["%0", "2", ">", "%0", "-1", "select"], [f0])
    np.testing.assert_allclose(out, [-1, 5])


def test_expression_unary_pow():
    f0 = np.array([4.0, 9.0], np.float32)
    out = evaluate_postfix(["%0", "sqrt"], [f0])
    np.testing.assert_allclose(out, [2, 3])
    out = evaluate_postfix(["%0", "0.5", "**"], [f0])
    np.testing.assert_allclose(out, [2, 3])


def test_expression_errors():
    with pytest.raises(ValueError):
        evaluate_postfix(["%0", "+"], [np.zeros(2)])
    with pytest.raises(ValueError):
        evaluate_postfix(["%5"], [np.zeros(2)])


def test_config_parse(tmp_path, amr_fixture):
    from owlexabrick_tpu.io import formats as F
    from owlexabrick_tpu.io.config import parse_config
    from owlexabrick_tpu.builder.bricker import build_bricks
    from owlexabrick_tpu.pipeline import bricks_from_build

    lower, level, scal = amr_fixture("0 0 0 4 4 4 0 0 1 2 3 4 5 6 7\n")
    res = build_bricks(lower, level)
    bricks, ids = bricks_from_build(res)
    F.write_bricks(
        str(tmp_path / "d.bricks"),
        bricks.lower, bricks.size, bricks.level,
        [ids[int(b): int(b) + int(np.prod(s))]
         for b, s in zip(bricks.begin, bricks.size)],
    )
    F.write_scalars(str(tmp_path / "d.scalars"), scal)
    cfg_text = """
# test config
bricks d.bricks
scalar density d.scalars
value_range 0.0 7.0
scalar dens2 expr "%0 2 *"
remap_from 0 0 0 4 4 4
remap_to 0 0 0 1 1 1
"""
    p = tmp_path / "d.exa"
    p.write_text(cfg_text)
    cfg = parse_config(str(p))
    assert cfg.bricks is not None
    assert [f.name for f in cfg.scalar_fields] == ["density", "dens2"]
    assert cfg.scalar_fields[0].value_range == (0.0, 7.0)
    np.testing.assert_allclose(
        cfg.scalar_fields[1].values, cfg.scalar_fields[0].values * 2
    )
    # remap: world [0,1]^3 -> voxel [0,4]^3
    m = cfg.voxel_from_world()
    np.testing.assert_allclose(m[:, :3], np.eye(3) * 4, atol=1e-6)
    w_lo, w_hi = cfg.world_bounds()
    np.testing.assert_allclose(w_lo, [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(w_hi, [1, 1, 1], atol=1e-6)
