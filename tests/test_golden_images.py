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


def _render_featured(scene, *, cfg=None, fs_patch=None, surf=None,
                     frames=2, fast=False, tilted=False):
    """Renderer-driven golden with feature knobs: a patched frame state
    (iso/contour/clip/AO fields), a SurfaceData (mesh/streamlines), and
    either path."""
    import dataclasses

    cam = _cam(tilted)
    fs = make_frame_state(cam, 1, [[0.0, 1.05]], dt=1.0, opacity_scale=0.7)
    if fs_patch:
        fs = dataclasses.replace(fs, **fs_patch)
    cfg = cfg or RenderConfig(num_channels=1)
    r = Renderer(scene, W, H, cfg=cfg, frame_state=fs, surfaces=surf)
    if fast:
        assert r.enable_fast_path()
    img = r.render_frames(frames)
    return r.image_uint8(img)


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


# ---------------------------------------------------------------------------
# composite-feature goldens (VERDICT r3 task 5): iso, contour, clip box,
# mesh+volume, tracer segments, multi-channel, AO (both estimators)
# ---------------------------------------------------------------------------

def test_golden_iso(scene):
    """Implicit iso surface composited with DVR (wavefront surface pass,
    exabrick.cu:1018-1114)."""
    img = _render_featured(
        scene,
        cfg=RenderConfig(num_channels=1, iso_surfaces=True),
        fs_patch=dict(
            iso_enabled=np.asarray([True, False]),
            iso_value=np.asarray([0.55, 0.0], np.float32),
            iso_channel=np.zeros(2, np.int32),
        ),
    )
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "iso")


def test_golden_contour(scene):
    """Contour plane (box-plane polygon intersect + field-colored hit,
    exabrick.cu:1267-1406)."""
    n = np.zeros((3, 3), np.float32)
    n[0] = [0.0, 0.0, 1.0]
    img = _render_featured(
        scene,
        fs_patch=dict(
            contour_enabled=np.asarray([True, False, False]),
            contour_normal=n,
            # offset is FRACTIONAL in the world box (exabrick.cu:1356-62)
            contour_offset=np.asarray([0.65, 0.5, 0.5], np.float32),
            contour_channel=np.zeros(3, np.int32),
        ),
    )
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "contour")


def test_golden_clipbox(scene):
    """Clip box shrinks the integration interval (clipRay,
    exabrick.cu:1258-1264)."""
    img = _render_featured(
        scene,
        fs_patch=dict(
            clip_enabled=np.bool_(True),
            clip_lo=np.asarray([N * 0.25, 0.0, 0.0], np.float32),
            clip_hi=np.asarray([N, N, N * 0.8], np.float32),
        ),
    )
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "clipbox")


def _quad_surface():
    """Two triangles forming a quad slicing the volume diagonally."""
    from owlexabrick_tpu.render.surfaces import SurfaceData

    v = np.asarray([
        [2.0, 2.0, N * 0.7], [N - 2.0, 2.0, N * 0.55],
        [N - 2.0, N - 2.0, N * 0.55], [2.0, N - 2.0, N * 0.7],
    ], np.float32)
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    v0 = v[tris[:, 0]]
    e1 = v[tris[:, 1]] - v0
    e2 = v[tris[:, 2]] - v0
    nrm = np.cross(e1, e2)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    z = np.zeros((0, 3), np.float32)
    return SurfaceData(
        tri_v0=v0, tri_e1=e1, tri_e2=e2, tri_n=nrm.astype(np.float32),
        seg_a=z, seg_b=z, seg_t=np.zeros(0, np.int32),
        seg_radius=np.float32(0.5),
    )


def test_golden_mesh_volume(scene):
    """Triangle mesh composited with the volume (traceSurfaces nearest-
    wins + DVR t_end at the hit, exabrick.cu:1475-1529)."""
    img = _render_featured(scene, surf=_quad_surface())
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "mesh_volume")


def test_golden_tracer_segments(scene):
    """Streamline segments as rounded cones, timestep-culled
    (exabrick.cu:440-573)."""
    from owlexabrick_tpu.render.surfaces import SurfaceData

    # a wide helix: partly in front of the volume so the rounded cones
    # read clearly against both volume and background
    t = np.linspace(0.0, 4.0 * np.pi, 33)
    pts = np.stack([
        N * 0.5 + N * 0.55 * np.cos(t),
        N * 0.5 + N * 0.55 * np.sin(t),
        N * 0.8 + t * (N * 0.2 / (4.0 * np.pi)),
    ], axis=1).astype(np.float32)
    z = np.zeros((0, 3), np.float32)
    surf = SurfaceData(
        tri_v0=z, tri_e1=z, tri_e2=z, tri_n=z,
        seg_a=pts[:-1], seg_b=pts[1:],
        seg_t=np.arange(1, 33, dtype=np.int32),
        seg_radius=np.float32(1.2),
    )
    img = _render_featured(
        scene, surf=surf,
        # hide the last 8 segments: the timestep cull must show
        fs_patch=dict(tracer_timestep=np.int32(25)),
    )
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "tracer_segments")


def test_golden_multichannel():
    """Two channels classified per slab in the reference's channel merge
    order (exabrick.cu:1169-1179)."""
    vol = synthetic_volume(N)
    lower, level, scal = volume_to_cells(vol, 0.004, 3)
    s2, *_ = scene_from_cells(
        lower, level, [scal, 1.05 - scal], num_range_channels=2
    )
    cam = _cam()
    # channel 2's domain is widened so the inverse field stays mostly
    # transparent and both channels' structure reads in the image
    fs = make_frame_state(
        cam, 2, [[0.0, 1.05], [0.0, 4.0]], dt=1.0, opacity_scale=0.5
    )
    r = Renderer(s2, W, H, cfg=RenderConfig(num_channels=2),
                 frame_state=fs)
    img = r.image_uint8(r.render_frames(2))
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "multichannel")


@pytest.mark.slow
def test_golden_ao_exact(scene):
    """Exact per-pixel hemisphere AO (exabrick.cu:1612-1645) accumulated
    over 6 progressive frames — pins the converged estimator image."""
    img = _render_featured(
        scene,
        cfg=RenderConfig(num_channels=1, iso_surfaces=True, ao_samples=2),
        fs_patch=dict(
            iso_enabled=np.asarray([True, False]),
            iso_value=np.asarray([0.55, 0.0], np.float32),
            iso_channel=np.zeros(2, np.int32),
            ao_enabled=np.bool_(True),
            ao_length=np.float32(N * 0.5),
        ),
        frames=6,
    )
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "ao_exact")


def test_golden_ao_sweep(scene):
    """Fast-path pooled-direction AO estimator (render/ao_sweep.py)
    accumulated over 6 frames — the interactive estimator's image."""
    img = _render_featured(
        scene,
        cfg=RenderConfig(num_channels=1, iso_surfaces=True, ao_samples=2),
        fs_patch=dict(
            iso_enabled=np.asarray([True, False]),
            iso_value=np.asarray([0.55, 0.0], np.float32),
            iso_channel=np.zeros(2, np.int32),
            ao_enabled=np.bool_(True),
            ao_length=np.float32(N * 0.5),
        ),
        frames=6,
        fast=True,
    )
    assert (img[..., :3] > 16).any(), "blank render"
    _check(img, "ao_sweep")
