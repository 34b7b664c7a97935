"""Full-scene integration (VERDICT r3 task 6): one ``.exa`` config that
combines an expression field, a triangle mesh, iso + contour + tracer,
driven through the offline viewer CLI to a golden-checked frame — the
reference's daily workflow (README.md:120-175, exa/viewer.cpp:1087-1309)
— plus synthetic FLASH/Chombo HDF5 files fed through the converters into
the same pipeline."""

import os
import pathlib

import numpy as np
import pytest

from owlexabrick_tpu.io import formats
from owlexabrick_tpu.utils.png import read_png, write_png

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
UPDATE = os.environ.get("OWLEXA_UPDATE_GOLDEN", "") == "1"


def _check_golden(img, name):
    path = GOLDEN_DIR / f"{name}.png"
    if UPDATE or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        write_png(str(path), np.ascontiguousarray(img))
        if UPDATE:
            pytest.skip(f"golden updated: {path}")
        raise AssertionError(f"golden {path} was missing; wrote it")
    want = read_png(str(path))
    assert want.shape == img.shape
    d = np.abs(img.astype(int) - want.astype(int))
    assert d.max() <= 1, f"{name}: max abs diff {d.max()} > 1/255"
    assert (d == 0).all(-1).mean() >= 0.99


@pytest.fixture(scope="module")
def full_scene_dir(tmp_path_factory):
    """artificial grids -> builder CLI -> multi-field .exa with an
    expression field, a remap transform, and a .tris mesh."""
    from owlexabrick_tpu.builder.__main__ import main as build_main
    from owlexabrick_tpu.core.types import TriangleMesh
    from owlexabrick_tpu.tools.artificial import generate

    d = tmp_path_factory.mktemp("fullscene")
    grids = d / "two.grids"
    grids.write_text(
        "0 0 0 6 6 6 0 0 1 2 3 4 5 6 7\n6 0 0 2 2 2 1 4\n"
    )
    generate(str(grids), str(d / "d"))
    rc = build_main([str(d / "d.cells"), "-o", str(d / "d.bricks")])
    assert rc == 0
    # second per-cell field, same cell order as d.scalars
    dens = formats.read_scalars(str(d / "d.scalars"))
    formats.write_scalars(str(d / "inv.scalars"), 7.0 - dens)
    # a quad mesh slicing the model
    v = np.asarray(
        [[0.5, 0.5, 5.5], [7.5, 0.5, 4.5], [7.5, 7.5, 4.5],
         [0.5, 7.5, 5.5]], np.float32,
    )
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    formats.write_tris(
        str(d / "m.tris"), [TriangleMesh(vertices=v, indices=tris)]
    )
    (d / "scene.exa").write_text(
        "# full-feature scene (README.md:120-175 style)\n"
        "bricks d.bricks\n"
        "scalar density d.scalars\n"
        "value_range 0 7\n"
        "scalar inv inv.scalars\n"
        "value_range 0 7\n"
        'scalar combo expr "%0 %1 +"\n'
        "triangles m.tris\n"
        "remap_from 0 0 0 8 8 8\n"
        "remap_to 0 0 0 8 8 8\n"
    )
    return d


def test_full_scene_cli_golden(full_scene_dir, tmp_path):
    """Expression field + mesh + iso + contour + tracer in ONE CLI run
    to a golden-checked rendered frame."""
    from owlexabrick_tpu.viewer.offline import main

    out = str(tmp_path / "full.png")
    rc = main([
        str(full_scene_dir / "scene.exa"), "--size", "48", "36",
        "--camera", "20", "15", "25", "4", "3", "3", "0", "1", "0",
        "--fov", "45", "--range", "0", "7", "--dt", "0.7",
        "--isovals", "3.5", "--isochans", "0",
        "--contourplane", "0", "0", "1", "0.4", "--contourchan", "0",
        "--tracer", "3", "--tracer-channels", "0", "1", "2",
        "--tracer-seeds", "16", "--tracer-steplen", "0.5",
        "--frames", "2", "-o", out,
    ])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (36, 48, 4)
    assert (img[..., :3] > 8).any(), "blank render"
    _check_golden(img, "e2e_full_cli")


def test_full_scene_multifield_fast(full_scene_dir, tmp_path):
    """The same scene through --multi-field + --fast (slab sweep):
    expression channel participates in the channel merge."""
    from owlexabrick_tpu.viewer.offline import main

    out = str(tmp_path / "mf.png")
    rc = main([
        str(full_scene_dir / "scene.exa"), "--size", "48", "36",
        "--camera", "4", "4", "28", "4", "4", "4", "0", "1", "0",
        "--fov", "40", "--range", "0", "7", "--dt", "0.7",
        "--multi-field", "--fast", "--frames", "1", "-o", out,
    ])
    assert rc == 0
    img = read_png(out)
    assert (img[..., :3] > 8).any(), "blank render"


def test_flash_to_render(tmp_path):
    """Synthetic FLASH4 HDF5 -> flash2cells -> builder -> .exa ->
    rendered frame (the reference's FLASH recipe, README.md:151-160)."""
    h5py = pytest.importorskip("h5py")
    from owlexabrick_tpu.builder.__main__ import main as build_main
    from owlexabrick_tpu.tools.flash2cells import main as flash_main
    from owlexabrick_tpu.viewer.offline import main as view_main

    nb, n = 2, 4
    h5 = str(tmp_path / "flash.h5")
    with h5py.File(h5, "w") as f:
        f["refine level"] = np.asarray([1, 2])
        f["node type"] = np.asarray([1, 1])
        bnd = np.zeros((nb, 3, 2))
        bnd[0] = [[0, 8], [0, 8], [0, 8]]
        bnd[1] = [[0, 4], [0, 4], [0, 4]]
        f["bounding box"] = bnd
        f["dens"] = np.arange(nb * n ** 3, dtype=np.float64).reshape(
            nb, n, n, n)
    rc = flash_main([h5, "--var", "dens", "-o", str(tmp_path / "fl")])
    assert rc in (0, None)
    rc = build_main([str(tmp_path / "fl.cells"), "-o",
                     str(tmp_path / "fl.bricks")])
    assert rc == 0
    (tmp_path / "fl.exa").write_text(
        "bricks fl.bricks\nscalar dens fl.scalars\n"
    )
    out = str(tmp_path / "fl.png")
    rc = view_main([
        str(tmp_path / "fl.exa"), "--size", "32", "24",
        "--camera", "20", "14", "22", "4", "4", "4", "0", "1", "0",
        "--range", "0", "128", "--dt", "0.7", "--frames", "1", "-o", out,
    ])
    assert rc == 0
    img = read_png(out)
    assert (img[..., :3] > 8).any(), "blank render"


def _write_vtu_hexes(path, lowers, widths, cf, arrays):
    """Minimal ascii VTU UnstructuredGrid of axis-aligned cube hexes on
    the LANL lattice (corner = lattice * common factor), the shape
    readVTU.cpp:239-292 verifies."""
    pts, conn = [], []
    for lo, w in zip(lowers, widths):
        base = len(pts)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    pts.append((np.asarray(lo, float)
                                + np.asarray([dx, dy, dz]) * w) * cf)
        # VTK_HEXAHEDRON corner order (bottom CCW, then top)
        conn += [base + i for i in (0, 1, 3, 2, 4, 5, 7, 6)]
    n_cells = len(lowers)
    offs = [8 * (i + 1) for i in range(n_cells)]
    cell_data = "\n".join(
        '        <DataArray type="Float32" Name="%s" format="ascii">\n'
        "          %s\n        </DataArray>" % (
            name, " ".join("%g" % v for v in vals))
        for name, vals in arrays.items()
    )
    with open(path, "w") as f:
        f.write(
            '<VTKFile type="UnstructuredGrid" version="1.0" '
            'byte_order="LittleEndian" header_type="UInt32">\n'
            "  <UnstructuredGrid>\n"
            f'    <Piece NumberOfPoints="{len(pts)}" '
            f'NumberOfCells="{n_cells}">\n'
            "      <Points>\n"
            '        <DataArray type="Float64" NumberOfComponents="3" '
            'format="ascii">\n          '
            + " ".join("%.10g" % c for p in pts for c in p)
            + "\n        </DataArray>\n      </Points>\n"
            "      <Cells>\n"
            '        <DataArray type="Int64" Name="connectivity" '
            'format="ascii">\n          '
            + " ".join(map(str, conn))
            + "\n        </DataArray>\n"
            '        <DataArray type="Int64" Name="offsets" '
            'format="ascii">\n          '
            + " ".join(map(str, offs))
            + "\n        </DataArray>\n"
            '        <DataArray type="UInt8" Name="types" '
            'format="ascii">\n          '
            + " ".join(["12"] * n_cells)
            + "\n        </DataArray>\n      </Cells>\n"
            "      <CellData>\n" + cell_data + "\n      </CellData>\n"
            "    </Piece>\n  </UnstructuredGrid>\n</VTKFile>\n"
        )


def test_vtu_time_series(tmp_path):
    """LANL deep-water workflow (reference README.md:135-147,
    readVTU.cpp:295-302): a VTU TIME SERIES — one file per timestep,
    identical hex geometry, evolving cell scalars — converted per
    timestep, bricked once, and both timesteps rendered through the CLI
    at a fixed camera + TF.  Golden-checks each frame and asserts the
    frame delta tracks the scalar change."""
    from owlexabrick_tpu.builder.__main__ import main as build_main
    from owlexabrick_tpu.tools.vtu import main as vtu_main
    from owlexabrick_tpu.viewer.offline import main as view_main

    cf = 5 * 500 / 4  # the deep-water lattice factor (readVTU.cpp:123)
    # 2x2x2 unit hexes plus one 2-wide (level-1) hex beside them
    lowers = [(x, y, z) for z in (0, 1) for y in (0, 1) for x in (0, 1)]
    widths = [1] * 8
    lowers.append((2, 0, 0))
    widths.append(2)
    vals = {
        0: np.concatenate([np.linspace(0.1, 0.8, 8), [1.0]]),
        # the hot corner moves and the coarse hex cools
        1: np.concatenate([np.linspace(0.8, 0.1, 8), [0.3]]),
    }
    for t in (0, 1):
        _write_vtu_hexes(
            str(tmp_path / f"step{t}.vtu"), lowers, widths, cf,
            {"temp": vals[t]},
        )
        rc = vtu_main([str(tmp_path / f"step{t}.vtu"), "-o",
                       str(tmp_path / f"step{t}")])
        assert rc == 0
    # identical geometry -> identical .cells; brick ONCE, reuse for all
    # timesteps with per-timestep scalars (the reference's recipe builds
    # the structure once and the .exa names each timestep's field)
    c0 = (tmp_path / "step0.cells").read_bytes()
    assert c0 == (tmp_path / "step1.cells").read_bytes()
    rc = build_main([str(tmp_path / "step0.cells"), "-o",
                     str(tmp_path / "series.bricks")])
    assert rc == 0
    imgs = []
    for t in (0, 1):
        (tmp_path / f"step{t}.exa").write_text(
            f"bricks series.bricks\nscalar temp step{t}.temp.scalars\n"
        )
        out = str(tmp_path / f"vtu_t{t}.png")
        rc = view_main([
            str(tmp_path / f"step{t}.exa"), "--size", "32", "24",
            "--camera", "14", "9", "13", "2", "1", "1", "0", "1", "0",
            "--fov", "45", "--range", "0", "1", "--dt", "0.7",
            "--frames", "1", "-o", out,
        ])
        assert rc == 0
        img = read_png(out)
        assert (img[..., :3] > 8).any(), f"blank render at t{t}"
        _check_golden(img, f"e2e_vtu_t{t}")
        imgs.append(img.astype(int))
    delta = np.abs(imgs[1] - imgs[0])
    assert delta.max() > 16, "timestep change did not reach the frame"


def test_chombo_to_render(tmp_path):
    """Synthetic Chombo-style HDF5 -> converter -> builder -> .exa ->
    rendered frame."""
    h5py = pytest.importorskip("h5py")
    from owlexabrick_tpu.builder.__main__ import main as build_main
    from owlexabrick_tpu.tools.chombo import convert
    from owlexabrick_tpu.viewer.offline import main as view_main

    n = 4
    h5 = str(tmp_path / "ch.h5")
    with h5py.File(h5, "w") as f:
        bnd = np.zeros((2, 3, 2))
        bnd[0] = [[0, 1], [0, 1], [0, 1]]
        bnd[1] = [[1, 3], [0, 2], [0, 2]]
        f["bounding box"] = bnd
        f["dens"] = np.linspace(0, 1, 2 * n ** 3).reshape(2, n, n, n)
        f["temp"] = np.full((2, n, n, n), 2.0, np.float32)
    convert(h5, str(tmp_path / "ch"), ("dens", "temp"), block_n=n)
    rc = build_main([str(tmp_path / "ch.cells"), "-o",
                     str(tmp_path / "ch.bricks")])
    assert rc == 0
    (tmp_path / "ch.exa").write_text(
        "bricks ch.bricks\nscalar dens ch.dens\n"
    )
    out = str(tmp_path / "ch.png")
    rc = view_main([
        str(tmp_path / "ch.exa"), "--size", "32", "24",
        "--camera", "22", "16", "26", "6", "4", "4", "0", "1", "0",
        "--range", "0", "1", "--dt", "0.7", "--frames", "1", "-o", out,
    ])
    assert rc == 0
    img = read_png(out)
    assert (img[..., :3] > 8).any(), "blank render"
