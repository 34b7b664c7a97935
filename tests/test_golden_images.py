"""Golden-image regression for the bench scene (VERDICT r2 weak #4).

Perf regressions are caught by bench.py; fidelity regressions were not
pinned until now.  These tests render the reproducible bench scene
(BASELINE.md synthetic config) through the wavefront AND fast paths
with fixed cameras/TF and compare against checked-in golden PNGs at
display precision (every pixel within 1/255 per channel, >=99% exact).

To regenerate after an *intentional* quadrature change:

    OWLEXA_UPDATE_GOLDEN=1 python -m pytest tests/test_golden_images.py

then review the updated tests/golden/*.png visually and commit them.
"""

import os
import pathlib

import numpy as np
import pytest

from owlexabrick_tpu.bench_scene import synthetic_volume
from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render.camera import Camera
from owlexabrick_tpu.render.dvr import RenderConfig
from owlexabrick_tpu.render.frame import make_frame_state
from owlexabrick_tpu.render.renderer import Renderer
from owlexabrick_tpu.tools.raw2cells import volume_to_cells
from owlexabrick_tpu.utils.png import read_png, write_png

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
UPDATE = os.environ.get("OWLEXA_UPDATE_GOLDEN", "") == "1"
W, H = 96, 64
N = 32


@pytest.fixture(scope="module")
def scene():
    vol = synthetic_volume(N)
    lower, level, scal = volume_to_cells(vol, 0.004, 3)
    s, *_ = scene_from_cells(lower, level, [scal])
    return s


def _cam(tilted=False):
    eye = [N * 0.9, N * 0.8, N * 2.1] if tilted else [N / 2, N / 2, N * 2.1]
    return Camera.look_at(eye, [N / 2, N / 2, N / 2], [0, 1, 0], 45.0, W, H)


def _render(scene, name, *, tilted=False, fast=True, stride=False,
            frames=2):
    cam = _cam(tilted)
    fs = make_frame_state(cam, 1, [[0.0, 1.05]], dt=1.0, opacity_scale=0.7)
    cfg = RenderConfig(num_channels=1, adaptive_stride=stride)
    r = Renderer(scene, W, H, cfg=cfg, frame_state=fs)
    if fast:
        assert r.enable_fast_path()
        if tilted:
            assert r._fast[2] == "shearwarp", "tilted golden must be exact"
    img = r.render_frames(frames)
    return r.image_uint8(img)  # (H, W, 4) uint8, top-down


def _check(img, name):
    path = GOLDEN_DIR / f"{name}.png"
    if UPDATE or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        write_png(str(path), np.ascontiguousarray(img))
        if UPDATE:
            pytest.skip(f"golden updated: {path}")
        raise AssertionError(
            f"golden {path} was missing; wrote it — review and commit"
        )
    want = read_png(str(path))
    assert want.shape == img.shape, (want.shape, img.shape)
    d = np.abs(img.astype(int) - want.astype(int))
    exact = (d == 0).all(-1).mean()
    assert d.max() <= 1, (
        f"{name}: max abs diff {d.max()} > 1/255 "
        f"(regenerate deliberately with OWLEXA_UPDATE_GOLDEN=1)"
    )
    assert exact >= 0.99, f"{name}: only {exact:.3f} pixels bit-exact"


def test_golden_wavefront(scene):
    img = _render(scene, "wavefront", fast=False)
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "wavefront")


def test_golden_fast_axis_aligned(scene):
    img = _render(scene, "fast_aligned")
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "fast_aligned")


def test_golden_fast_shearwarp(scene):
    img = _render(scene, "fast_shearwarp", tilted=True)
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "fast_shearwarp")


def test_golden_fast_adaptive_stride(scene):
    img = _render(scene, "fast_stride", stride=True)
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "fast_stride")
