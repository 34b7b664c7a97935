"""Converter and tracer tests."""

import numpy as np
import pytest

from owlexabrick_tpu.io import formats


def test_raw2cells_partition_and_values():
    """Octree collapse must cover every input voxel exactly once, and
    constant regions must collapse to coarse cells with the exact value."""
    from owlexabrick_tpu.tools.raw2cells import volume_to_cells

    rng = np.random.default_rng(0)
    vol = np.zeros((16, 16, 16), np.float32)
    vol[:8, :8, :8] = 0.5  # constant octant -> collapses
    vol[8:, 8:, 8:] = rng.uniform(0, 1, (8, 8, 8))  # noisy -> stays fine
    lower, level, scal = volume_to_cells(vol, threshold=1e-6, max_level=3)

    covered = np.zeros_like(vol, bool)
    for lo, lv, s in zip(lower, level, scal):
        cw = 1 << lv
        x, y, z = lo
        block = (slice(z, z + cw), slice(y, y + cw), slice(x, x + cw))
        assert not covered[block].any(), "voxel covered twice"
        covered[block] = True
        np.testing.assert_allclose(vol[block].mean(), s, rtol=1e-5)
        assert np.ptp(vol[block]) <= 1e-6 or cw == 1
    assert covered.all()
    # the constant octant must be a single level-3 cell
    assert ((level == 3) & (lower == 0).all(axis=1)).sum() == 1


def test_flash2cells(tmp_path):
    h5py = pytest.importorskip("h5py")
    from owlexabrick_tpu.tools.flash2cells import convert, list_variables

    # synthetic 2-block FLASH file: one coarse root-like leaf + one refined
    nb, n = 2, 4
    path = str(tmp_path / "flash.h5")
    with h5py.File(path, "w") as f:
        f["refine level"] = np.asarray([1, 2])
        f["node type"] = np.asarray([1, 1])
        bnd = np.zeros((nb, 3, 2))
        bnd[0] = [[0, 8], [0, 8], [0, 8]]
        bnd[1] = [[0, 4], [0, 4], [0, 4]]
        f["bounding box"] = bnd
        f["dens"] = np.arange(nb * n**3, dtype=np.float64).reshape(nb, n, n, n)
    assert "dens" in list_variables(path)
    ncells, max_level = convert(path, "dens", str(tmp_path / "out"))
    assert ncells == 2 * n**3
    assert max_level == 2
    lower, level = formats.read_cells(str(tmp_path / "out.cells"))
    scal = formats.read_scalars(str(tmp_path / "out.scalars"))
    assert scal.size == ncells
    # coarse block cells at level 1 (cw 2), fine at level 0
    assert set(np.unique(level)) == {0, 1}


def test_chombo(tmp_path):
    h5py = pytest.importorskip("h5py")
    from owlexabrick_tpu.tools.chombo import convert

    path = str(tmp_path / "ch.h5")
    n = 4
    with h5py.File(path, "w") as f:
        bnd = np.zeros((2, 3, 2))
        bnd[0] = [[0, 1], [0, 1], [0, 1]]
        bnd[1] = [[1, 3], [0, 2], [0, 2]]
        f["bounding box"] = bnd
        f["dens"] = np.ones((2, n, n, n), np.float32)
        f["temp"] = np.full((2, n, n, n), 2.0, np.float32)
    ncells = convert(path, str(tmp_path / "out"), ("dens", "temp"), block_n=n)
    assert ncells == 2 * n**3
    lower, level = formats.read_cells(str(tmp_path / "out.cells"))
    assert set(np.unique(level)) == {0, 1}
    t = formats.read_scalars(str(tmp_path / "out.temp"))
    np.testing.assert_allclose(t, 2.0)


def test_vtu_ascii_and_lanl(tmp_path):
    from owlexabrick_tpu.tools.vtu import convert_lanl_ocean, read_vtu

    cf = 5 * 500 / 4
    # two unit hexes (integer lattice x common factor), one double-size hex
    def hexa(lo, w):
        x, y, z = lo
        return [
            (x, y, z), (x + w, y, z), (x + w, y + w, z), (x, y + w, z),
            (x, y, z + w), (x + w, y, z + w), (x + w, y + w, z + w),
            (x, y + w, z + w),
        ]

    pts = []
    conn = []
    for lo, w in [((0, 0, 0), 1), ((1, 0, 0), 1), ((2, 0, 0), 2)]:
        base = len(pts)
        pts += [(c[0] * cf, c[1] * cf, c[2] * cf) for c in hexa(lo, w)]
        conn += list(range(base, base + 8))
    offsets = [8, 16, 24]
    types = [12, 12, 12]
    dens = [1.0, 2.0, 3.0]
    xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">
 <UnstructuredGrid><Piece NumberOfPoints="{len(pts)}" NumberOfCells="3">
  <Points><DataArray type="Float64" NumberOfComponents="3" format="ascii">
   {' '.join(str(v) for p in pts for v in p)}
  </DataArray></Points>
  <Cells>
   <DataArray type="Int64" Name="connectivity" format="ascii">{' '.join(map(str, conn))}</DataArray>
   <DataArray type="Int64" Name="offsets" format="ascii">{' '.join(map(str, offsets))}</DataArray>
   <DataArray type="UInt8" Name="types" format="ascii">{' '.join(map(str, types))}</DataArray>
  </Cells>
  <CellData><DataArray type="Float32" Name="dens" format="ascii">{' '.join(map(str, dens))}</DataArray></CellData>
 </Piece></UnstructuredGrid>
</VTKFile>"""
    p = tmp_path / "t.vtu"
    p.write_text(xml)
    pts_r, types_r, conn_r, offs_r, cd = read_vtu(str(p))
    assert pts_r.shape == (24, 3)
    assert (types_r == 12).all()
    n = convert_lanl_ocean([str(p)], str(tmp_path / "out"))
    assert n == 3
    lower, level = formats.read_cells(str(tmp_path / "out.cells"))
    np.testing.assert_array_equal(level, [0, 0, 1])
    np.testing.assert_array_equal(lower[2], [2, 0, 0])
    d = formats.read_scalars(str(tmp_path / "out.dens.scalars"))
    np.testing.assert_allclose(d, dens)


def test_vtk_polydata_to_tris(tmp_path):
    from owlexabrick_tpu.tools.vtu import convert_vtk_to_tris

    vtk = """# vtk DataFile Version 3.0
mesh
ASCII
DATASET POLYDATA
POINTS 5 float
0 0 0
1 0 0
1 1 0
0 1 0
0 0 1
POLYGONS 2 9
4 0 1 2 3
3 0 1 4
"""
    p = tmp_path / "m.vtk"
    p.write_text(vtk)
    out = str(tmp_path / "m.tris")
    n = convert_vtk_to_tris([str(p)], out)
    assert n == 3  # quad -> 2 tris + 1 tri
    meshes = formats.read_tris(out)
    assert len(meshes) == 1
    assert meshes[0].indices.shape == (3, 3)


def test_tracer_advects(amr_fixture):
    import jax
    import jax.numpy as jnp

    from owlexabrick_tpu.pipeline import scene_from_cells
    from owlexabrick_tpu.render.scene import to_device
    from owlexabrick_tpu.render.tracer import Tracer

    # constant positive field -> velocity (v,v,v) pushes particles along
    # the diagonal
    from conftest import EX2

    lower, level, scal = amr_fixture(EX2)
    scal = np.full_like(scal, 0.5)
    scene, *_ = scene_from_cells(lower, level, [scal])
    scene = to_device(scene)
    tr = Tracer(scene, num_traces=32, num_timesteps=5, steplen=1.0,
                channels=(0, 0, 0),
                seed_region_lo=(0.2, 0.2, 0.2), seed_region_hi=(0.4, 0.4, 0.4))
    assert tr.advance()
    p0 = tr.traces[:, 0]
    p1 = tr.traces[:, 1]
    live = np.abs(p1).max(axis=1) < 1e9
    assert live.sum() > 16
    d = p1[live] - p0[live]
    # motion along the +diagonal with magnitude ~0.5 per component
    np.testing.assert_allclose(d, 0.5, atol=0.05)
    # segments renderable
    sd = tr.surface_data()
    assert sd.num_segments == 32


def test_tracer_dies_outside(amr_fixture):
    import jax.numpy as jnp

    from owlexabrick_tpu.pipeline import scene_from_cells
    from owlexabrick_tpu.render.scene import to_device
    from owlexabrick_tpu.render.tracer import Tracer
    from conftest import EX2

    lower, level, scal = amr_fixture(EX2)
    scal = np.full_like(scal, 100.0)  # huge velocity -> leaves bounds
    scene, *_ = scene_from_cells(lower, level, [scal])
    tr = Tracer(to_device(scene), num_traces=8, num_timesteps=3, steplen=1.0)
    tr.advance()
    assert (np.abs(tr.traces[:, 1]).max(axis=1) > 1e9).all()


def test_raw2cells_cli(tmp_path):
    from owlexabrick_tpu.tools.raw2cells import main

    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 1, (8, 8, 8)).astype(np.float32)
    vol[:4] = 0.25
    raw = str(tmp_path / "v.raw")
    vol.tofile(raw)
    out = str(tmp_path / "out")
    rc = main(["8", "8", "8", "float", raw, out, "0.0001", "2"])
    assert rc == 0
    lower, level = formats.read_cells(out + ".cells")
    scal = formats.read_scalars(out + ".scalars")
    assert lower.shape[0] == scal.size
    assert (level <= 2).all()


def test_artificial_cli(tmp_path):
    from owlexabrick_tpu.tools.artificial import main

    g = tmp_path / "g.txt"
    g.write_text("0 0 0 3 3 3 0 1.5\n")
    out = str(tmp_path / "a")
    rc = main([str(g), "-o", out])
    assert rc == 0
    lower, level = formats.read_cells(out + ".cells")
    assert lower.shape[0] == 27
    scal = formats.read_scalars(out + ".scalars")
    np.testing.assert_allclose(scal, 1.5)


def test_builder_cli(tmp_path):
    from owlexabrick_tpu.builder.__main__ import main as builder_main
    from owlexabrick_tpu.tools.artificial import generate

    g = tmp_path / "g.txt"
    g.write_text("0 0 0 4 4 4 0 0 1 2 3 4 5 6 7\n")
    generate(str(g), str(tmp_path / "d"))
    rc = builder_main([
        str(tmp_path / "d.cells"), "-o", str(tmp_path / "d.bricks"),
        "-kd", str(tmp_path / "d.kd"),
    ])
    assert rc == 0
    bricks, ids = formats.read_bricks(str(tmp_path / "d.bricks"))
    assert bricks.num_bricks >= 1
    kd = formats.read_kd(str(tmp_path / "d.kd"))
    assert kd["axis"].size >= 1
