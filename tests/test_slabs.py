"""Slab fast-path tests: level-grid reconstruction must exactly equal the
brick-basis sampler; the sweep image must converge to the wavefront/oracle
image."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render.camera import Camera
from owlexabrick_tpu.render.dvr import RenderConfig, locate_leaf, sample_basis, trace_dvr
from owlexabrick_tpu.render.frame import make_frame_state
from owlexabrick_tpu.render.scene import to_device
from owlexabrick_tpu.render.slabs import (
    LevelGrids,
    SlabConfig,
    _slab_field,
    _xf_pwl,
    build_level_grids,
    check_separable,
    permute_camera,
    principal_axis,
    render_slabs,
    render_slabs_camera,
    xf_texel_coord,
)
from owlexabrick_tpu.render.xf import lookup_xf

from conftest import EX2, EX3, EX4


def _build(amr_fixture, text):
    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(text)
    scene, bricks, ids, regions, tree = scene_from_cells(lower, level, [scal])
    grids = build_level_grids(bricks, scene.scalars, axis=2)
    return scene, bricks, grids


@pytest.mark.parametrize("text", [EX2, EX3, EX4])
def test_level_grid_reconstruction_matches_basis(amr_fixture, text):
    """Dense-grid tent reconstruction == brick-basis sample_basis at
    arbitrary in-domain points (they are the same mathematical sum)."""
    scene, bricks, grids = _build(amr_fixture, text)
    dscene = to_device(scene)
    rng = np.random.default_rng(0)
    lo = np.asarray(scene.region_lo).min(0) + 1e-3
    hi = np.asarray(scene.region_hi).max(0) - 1e-3

    # pick a fixed z so slab-field applies; vary x, y on a small grid
    for zv in rng.uniform(lo[2], hi[2], 4):
        y = jnp.asarray(
            np.linspace(lo[1], hi[1], 7).astype(np.float32)
        )
        x = jnp.asarray(
            np.linspace(lo[0], hi[0], 9).astype(np.float32)
        )
        sw, swv = _slab_field(grids, jnp.float32(zv), y, x, 0)
        sw = np.asarray(sw)
        swv = np.asarray(swv)

        pts = np.stack(
            np.meshgrid(np.asarray(x), np.asarray(y), indexing="xy"), -1
        ).reshape(-1, 2)
        pts3 = np.concatenate(
            [pts, np.full((pts.shape[0], 1), zv, np.float32)], axis=1
        ).astype(np.float32)
        nodes = locate_leaf(dscene, jnp.asarray(pts3))
        rids = np.asarray(dscene.tree_leaf)[np.asarray(nodes)]
        ok, val = sample_basis(
            dscene, jnp.asarray(np.clip(rids, 0, None)), jnp.asarray(pts3), 0
        )
        ok = np.asarray(ok) & (rids >= 0)
        val = np.asarray(val)
        field = (swv / np.where(sw > 1e-20, sw, 1.0)).reshape(-1)
        valid = (sw > 1e-20).reshape(-1)
        np.testing.assert_array_equal(valid, ok)
        np.testing.assert_allclose(
            field[valid], val[valid], rtol=2e-5, atol=2e-5
        )


def test_xf_pwl_matches_lookup(amr_fixture):
    rng = np.random.default_rng(1)
    lut = jnp.asarray(rng.uniform(0, 1, (128, 4)).astype(np.float32))
    domain = jnp.asarray([0.3, 2.7], jnp.float32)
    vals = jnp.asarray(rng.uniform(-1, 4, 4096).astype(np.float32))
    want = np.asarray(lookup_xf(lut, domain, 1.0, vals))
    u = xf_texel_coord(vals, domain)
    got = np.stack(
        [np.asarray(_xf_pwl(lut[:, c], u)) for c in range(4)], axis=-1
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_slab_image_converges_to_wavefront(amr_fixture):
    """Axis-aligned camera: the slab sweep at fine sampling must closely
    match the exact wavefront renderer at fine dt (same integral)."""
    scene, bricks, grids = _build(amr_fixture, EX2)
    dscene = to_device(scene)
    size = 24
    cam = Camera.look_at(
        from_=[4.0, 4.0, 30.0], at=[4.0, 4.0, 4.0], up=[0, 1, 0],
        fovy_degrees=30.0, width=size, height=size,
    )
    axis = principal_axis(-np.asarray(cam.dir00) / np.linalg.norm(cam.dir00))
    assert axis == 2
    assert check_separable(cam, axis)

    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.05, opacity_scale=0.5)
    fs = jax.tree.map(jnp.asarray, fs)

    pos, dir00, du, dv = permute_camera(cam, axis)
    cfg = SlabConfig(num_channels=1, nslabs=256, chunk=32, flip=True)
    rgba_slab = np.asarray(
        jax.jit(render_slabs, static_argnames=("cfg", "width", "height"))(
            grids, fs, cfg, jnp.asarray(pos), jnp.asarray(dir00),
            jnp.asarray(du), jnp.asarray(dv), size, size,
        )
    )

    o, d = cam.rays(size, size)
    rgba_wf = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, fs, RenderConfig(num_channels=1),
            jnp.asarray(o), jnp.asarray(d), jnp.zeros(o.shape[0]),
        )
    )
    # both approximate the same integral with different quadratures
    rmse = np.sqrt(((rgba_slab - rgba_wf) ** 2).mean())
    assert rmse < 0.02, rmse
    # and the images are non-trivial
    assert rgba_wf[:, 3].max() > 0.2


def test_pwl_compression_exact(amr_fixture):
    """compress_pwl reconstructs a control-point LUT within tolerance, and
    the megakernel's compressed classification matches the dense path
    bit-for-bit on a full render."""
    from owlexabrick_tpu.core.constants import NUM_XF_VALUES
    from owlexabrick_tpu.render.slabs import compress_pwl, render_slabs_camera

    rng = np.random.default_rng(0)
    n = NUM_XF_VALUES
    cps = np.sort(rng.uniform(0, 1, 9))
    cps[0], cps[-1] = 0.0, 1.0
    cpv = rng.uniform(0, 1, (9, 4)).astype(np.float32)
    uu = np.linspace(0, 1, n)
    lut = np.stack(
        [np.interp(uu, cps, cpv[:, c]) for c in range(4)], 1
    ).astype(np.float32)
    kn = compress_pwl([lut])
    assert kn is not None
    pos, sd, base = kn.pos, kn.sd, kn.base
    assert kn.tau == (False,)  # exact breakpoints keep alpha space
    # ~2 texel breakpoints per interior control point, not all 127
    assert (pos[0] < n).sum() <= 20
    u = np.linspace(0, n - 1, 500)
    rec = base[0][None] + (
        np.maximum(u[:, None] - pos[0][None], 0.0)[:, :, None] * sd[0][None]
    ).sum(1)
    ref = np.stack([np.interp(u, np.arange(n), lut[:, c]) for c in range(4)], 1)
    assert np.abs(rec - ref).max() < 1e-3

    # full-render equivalence: numpy fs triggers compression, device fs
    # takes the dense path.  Use a control-point colormap (exact sparse
    # breakpoints); the embedded palette strips compress via the minimax
    # fit instead, which is sub-quantum but not bit-exact.
    from owlexabrick_tpu.viewer.colormaps import ColorMapper

    cmap = ColorMapper(
        [(float(p), tuple(v)) for p, v in zip(cps, cpv[:, :3])]
    )
    scene, bricks, grids = _build(amr_fixture, EX2)
    cam = Camera.look_at([4.0, 4.0, 25.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         40.0, 24, 24)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.5, opacity_scale=0.6,
                          colormap=cmap)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent / 0.5)))
    from owlexabrick_tpu.render.slabs import render_slabs_camera

    a = np.asarray(render_slabs_camera(grids, fs, cfg, cam, 24, 24))
    fsd = jax.tree.map(jnp.asarray, fs)
    b = np.asarray(render_slabs_camera(grids, fsd, cfg, cam, 24, 24))
    np.testing.assert_allclose(a, b, atol=5e-5)


def test_tf_lateral_cull_consistent(amr_fixture):
    """A narrow-band transfer function must produce the same image with
    and without the TF-aware lateral cull (space_skipping toggles it)."""
    from owlexabrick_tpu.render.slabs import render_slabs_camera

    scene, bricks, grids = _build(amr_fixture, EX3)
    assert grids.vrange_zy and len(grids.vrange_zy) == len(grids.levels)
    cam = Camera.look_at([4.0, 4.0, 25.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         40.0, 24, 24)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.5, opacity_scale=0.8)
    # opacity only in a narrow value band (iso-like TF edit)
    op = np.zeros(128, np.float32)
    op[60:70] = 1.0
    fs.xf_lut[0, :, 3] = op
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    ns = int(np.ceil(extent / 0.5))
    a = np.asarray(render_slabs_camera(
        grids, fs, SlabConfig(num_channels=1, nslabs=ns), cam, 24, 24))
    b = np.asarray(render_slabs_camera(
        grids, fs,
        SlabConfig(num_channels=1, nslabs=ns, space_skipping=False),
        cam, 24, 24))
    assert a[:, 3].max() > 0.01  # the band is actually visible
    # the cull inherits activeForVolumeSampling's texel-granularity edge
    # (exabrick.cu:250-281): values at a texel boundary can lerp to
    # sub-1e-6 alpha that the walk reports inactive — same as the
    # reference's TF-culled BVH, invisible at 8 bits
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_pwl_compression_dense_fallback():
    """A LUT with slope changes at every texel (not PWL-sparse) falls back
    to the dense path rather than losing fidelity."""
    from owlexabrick_tpu.core.constants import NUM_XF_VALUES
    from owlexabrick_tpu.render.slabs import compress_pwl

    n = NUM_XF_VALUES
    u = np.linspace(0, 6 * np.pi, n)
    lut = np.stack([np.sin(u + p) * 0.5 + 0.5 for p in range(4)], 1)
    assert compress_pwl([lut.astype(np.float32)]) is None


def test_slab_space_skipping_consistent(amr_fixture):
    scene, bricks, grids = _build(amr_fixture, EX2)
    size = 16
    cam = Camera.look_at([4.0, 4.0, 30.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, size, size)
    fs = jax.tree.map(
        jnp.asarray,
        make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.3),
    )
    pos, dir00, du, dv = permute_camera(cam, 2)
    f = jax.jit(render_slabs, static_argnames=("cfg", "width", "height"))
    a = np.asarray(f(grids, fs, SlabConfig(nslabs=128, flip=True, space_skipping=True),
                     pos, dir00, du, dv, size, size))
    b = np.asarray(f(grids, fs, SlabConfig(nslabs=128, flip=True, space_skipping=False),
                     pos, dir00, du, dv, size, size))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_axis_permutations(amr_fixture, axis):
    """Rendering along each principal axis produces consistent images of
    the same volume."""
    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(EX2)
    scene, bricks, *_ = scene_from_cells(lower, level, [scal])
    grids = build_level_grids(bricks, scene.scalars, axis=axis)
    size = 12
    eye = np.array([4.0, 4.0, 4.0])
    eye[axis] = 30.0
    up = [0, 1, 0] if axis != 1 else [1, 0, 0]
    cam = Camera.look_at(eye, [4.0, 4.0, 4.0], up, 30.0, size, size)
    assert check_separable(cam, axis), (axis, cam.dir_du, cam.dir_dv)
    fs = jax.tree.map(
        jnp.asarray, make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.3)
    )
    from owlexabrick_tpu.render.slabs import render_slabs_camera

    rgba = np.asarray(
        render_slabs_camera(grids, fs, SlabConfig(nslabs=384), cam, size, size)
    )
    assert np.isfinite(rgba).all()
    assert rgba[:, 3].max() > 0.2

    # must agree with the exact wavefront renderer in every orientation
    # (catches permutation/transposition mistakes)
    dscene = to_device(scene)
    o, d = cam.rays(size, size)
    rgba_wf = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, fs, RenderConfig(num_channels=1),
            jnp.asarray(o), jnp.asarray(d), jnp.zeros(o.shape[0]),
        )
    )
    rmse = np.sqrt(((rgba - rgba_wf) ** 2).mean())
    assert rmse < 0.05, rmse


def test_slab_iso_matches_wavefront(amr_fixture):
    """Fast-path iso: hit mask and shaded color must approximate the exact
    wavefront iso pass."""
    import dataclasses

    from owlexabrick_tpu.render.iso import trace_iso_rays
    from owlexabrick_tpu.render.slabs import render_slabs_iso

    scene, bricks, grids = _build(amr_fixture, EX2)
    dscene = to_device(scene)
    size = 24
    cam = Camera.look_at([4.0, 4.0, 30.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.05)
    fs = dataclasses.replace(
        fs,
        iso_enabled=np.array([True, False]),
        iso_value=np.array([3.5, 0.0], np.float32),
        iso_channel=np.zeros(2, np.int32),
    )
    fs = jax.tree.map(jnp.asarray, fs)

    from owlexabrick_tpu.render.slabs import permute_camera

    pos, dir00, du, dv = permute_camera(cam, 2)
    cfg = SlabConfig(nslabs=512, chunk=32, flip=True)
    rgba = np.asarray(
        jax.jit(render_slabs_iso, static_argnames=("cfg", "width", "height"))(
            grids, fs, cfg, jnp.asarray(pos), jnp.asarray(dir00),
            jnp.asarray(du), jnp.asarray(dv), size, size,
        )
    )

    o, d = cam.rays(size, size)
    t, n, c = jax.jit(trace_iso_rays, static_argnames="cfg")(
        dscene, fs, RenderConfig(num_channels=1, iso_surfaces=True),
        jnp.asarray(o), jnp.asarray(d), jnp.zeros(o.shape[0]),
        jnp.full(o.shape[0], 2e10),
    )
    hit_wf = np.isfinite(np.asarray(t))
    hit_slab = rgba[:, 3] > 0.5
    # masks agree except at silhouette pixels
    agree = (hit_wf == hit_slab).mean()
    assert agree > 0.92, agree
    # shaded colors correlate where both hit
    both = hit_wf & hit_slab
    if both.sum() > 8:
        cw = np.asarray(c)[both]
        cs = rgba[both][:, :3]
        err = np.abs(cw - cs).mean()
        assert err < 0.15, err


def test_fast_iso_dvr_composite_stops_at_surface(amr_fixture):
    """Combined iso+DVR fast path: the volume must not be integrated
    behind the iso surface (integrateVolume t1 = min(t1, surface t)).
    Compare the fast Renderer against the exact wavefront Renderer."""
    import dataclasses

    from owlexabrick_tpu.render.renderer import Renderer

    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(EX2)
    scene, *_ = scene_from_cells(lower, level, [scal])
    size = 24
    cam = Camera.look_at([4.0, 4.0, 30.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.1, opacity_scale=0.4)
    fs = dataclasses.replace(
        fs,
        iso_enabled=np.array([True, False]),
        iso_value=np.array([3.5, 0.0], np.float32),
        iso_channel=np.zeros(2, np.int32),
    )
    cfg = RenderConfig(num_channels=1, iso_surfaces=True)

    r_fast = Renderer(scene, size, size, cfg=cfg, frame_state=fs)
    assert r_fast.enable_fast_path()
    a = r_fast.render().view(np.uint8).reshape(size, size, 4).astype(int)

    r_exact = Renderer(scene, size, size, cfg=cfg, frame_state=fs)
    b = r_exact.render().view(np.uint8).reshape(size, size, 4).astype(int)

    # most pixels agree closely; silhouettes differ at slab granularity
    frac_close = (np.abs(a - b).max(-1) < 40).mean()
    assert frac_close > 0.8, frac_close
    assert (a[..., :3] > 8).any()


def test_banded_sweep_matches_single_pass(amr_fixture):
    """Out-of-core z-banded rendering must equal the single-pass sweep
    (band boundaries lie on the global slab lattice)."""
    from owlexabrick_tpu.builder.bricker import build_bricks
    from owlexabrick_tpu.pipeline import bricks_from_build
    from owlexabrick_tpu.render.slabs import (
        render_slabs_banded,
        render_slabs_camera,
    )
    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(EX3)
    scene, bricks, *_ = scene_from_cells(lower, level, [scal])
    size = 20
    for eye in ([4.0, 4.0, 25.0], [4.0, 4.0, -20.0]):  # both sweep dirs
        cam = Camera.look_at(eye, [4.0, 4.0, 4.0], [0, 1, 0],
                             35.0, size, size)
        fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.4,
                              opacity_scale=0.7)
        grids = build_level_grids(bricks, scene.scalars, axis=2)
        extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
        ns = 4 * -(-int(np.ceil(extent / 0.4)) // 4)
        cfg = SlabConfig(num_channels=1, nslabs=ns)
        single = np.asarray(
            render_slabs_camera(grids, fs, cfg, cam, size, size)
        )
        banded = render_slabs_banded(
            bricks, scene.scalars, fs, cfg, cam, size, size, n_bands=4
        )
        np.testing.assert_allclose(banded, single, atol=2e-5)
        assert single[:, 3].max() > 0.1


def test_fast_path_with_remap_transform(amr_fixture):
    """World->voxel remap (remap_from/remap_to): the fast path must agree
    with the exact wavefront path when the scene uses a non-identity
    transform."""
    from owlexabrick_tpu.builder.bricker import build_bricks
    from owlexabrick_tpu.core.types import ScalarField
    from owlexabrick_tpu.pipeline import bricks_from_build
    from owlexabrick_tpu.render.renderer import Renderer
    from owlexabrick_tpu.render.scene import build_scene

    lower, level, scal = amr_fixture(EX2)
    res = build_bricks(lower, level)
    bricks, ids = bricks_from_build(res)
    # world [0,1]^3 maps to voxel [0,8]^3
    vfw = np.zeros((3, 4), np.float32)
    vfw[:, :3] = np.eye(3) * 8.0
    scene, *_ = build_scene(
        bricks, ids, [ScalarField.from_values("f", scal)],
        voxel_from_world=vfw,
    )

    size = 16
    cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0],
                         30.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.1, opacity_scale=0.5)

    r1 = Renderer(scene, size, size, cfg=RenderConfig(num_channels=1),
                  frame_state=fs)
    exact = r1.render()
    r2 = Renderer(scene, size, size, cfg=RenderConfig(num_channels=1),
                  frame_state=fs)
    assert r2.enable_fast_path()
    fast = r2.render()
    a = exact.view(np.uint8).reshape(size, size, 4)[..., :3].astype(float)
    b = fast.view(np.uint8).reshape(size, size, 4)[..., :3].astype(float)
    rmse = np.sqrt((((a - b) / 255.0) ** 2).mean())
    # wavefront-vs-oracle is exact under remap (checked separately); the
    # residual here is pure quadrature difference between the two paths
    assert rmse < 0.06, rmse
    assert a.max() > 30  # scene visible


def test_camera_inside_volume(amr_fixture):
    """Camera placed inside the volume: only slabs in front contribute
    (matches the wavefront path which starts at t=0)."""
    scene, bricks, grids = _build(amr_fixture, EX2)
    dscene = to_device(scene)
    size = 12
    cam = Camera.look_at([4.0, 4.0, 2.0], [4.0, 4.0, 30.0], [0, 1, 0],
                         40.0, size, size)
    fs = jax.tree.map(
        jnp.asarray,
        make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.05, opacity_scale=0.5),
    )
    from owlexabrick_tpu.render.slabs import render_slabs_camera

    rgba_s = np.asarray(
        render_slabs_camera(
            grids, fs, SlabConfig(nslabs=512, chunk=32), cam, size, size
        )
    )
    o, d = cam.rays(size, size)
    rgba_w = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, fs, RenderConfig(num_channels=1),
            jnp.asarray(o), jnp.asarray(d), jnp.zeros(o.shape[0]),
        )
    )
    rmse = np.sqrt(((rgba_s - rgba_w) ** 2).mean())
    assert rmse < 0.03, rmse
    assert rgba_w[:, 3].max() > 0.1


def test_reoriented_fast_path_tilted_camera(amr_fixture):
    """Grid-reorientation fallback (used when the frustum is too oblique
    for shear-warp): the preview must approximate the exact wavefront
    render."""
    from owlexabrick_tpu.render.slabs import (
        camera_to_voxel,
        render_slabs_camera,
        reorient_grids,
    )

    from owlexabrick_tpu.pipeline import scene_from_cells
    from owlexabrick_tpu.tools.artificial import parse_grids_text

    lower, level, scal = parse_grids_text(EX2)
    scene, bricks, *_ = scene_from_cells(lower, level, [scal])
    size = 16
    cam = Camera.look_at([14.0, 11.0, 17.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         35.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.1, opacity_scale=0.5)

    dscene = to_device(scene)
    o, d = cam.rays(size, size)
    exact = np.asarray(
        jax.jit(trace_dvr, static_argnames="cfg")(
            dscene, jax.tree.map(jnp.asarray, fs),
            RenderConfig(num_channels=1),
            jnp.asarray(o), jnp.asarray(d), jnp.zeros(o.shape[0]),
        )
    )

    grids = build_level_grids(bricks, scene.scalars, axis=2)
    grids_rot, cam_rot = reorient_grids(grids, cam)
    extent = float(grids_rot.bounds_hi[0] - grids_rot.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent / 0.1)))
    fast = np.asarray(
        render_slabs_camera(grids_rot, fs, cfg, cam_rot, size, size)
    )
    rmse = np.sqrt(((exact - fast) ** 2).mean())
    # approximate preview: resampling at cell granularity blurs the very
    # coarse 8^3 fixture noticeably; silhouettes must agree
    assert rmse < 0.15, rmse
    sil_a = exact[:, 3] > 0.05
    sil_b = fast[:, 3] > 0.05
    assert (sil_a == sil_b).mean() > 0.85
    assert exact[:, 3].max() > 0.3 and fast[:, 3].max() > 0.3


def test_tau_knots_strip_palette(amr_fixture):
    """Embedded palette strips (8-bit dither, no sparse exact breakpoint
    set) compress with the alpha component in optical-depth space
    (tau = -log(1-a)); a full render stays within a display quantum of
    the dense range-limited path."""
    from owlexabrick_tpu.render.slabs import compress_pwl, render_slabs_camera

    scene, bricks, grids = _build(amr_fixture, EX2)
    cam = Camera.look_at([4.0, 4.0, 25.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         40.0, 24, 24)
    # make_frame_state's default "Jet" is the reference's embedded strip
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.5, opacity_scale=0.6)
    lut = np.concatenate(
        [fs.xf_lut[0, :, :3], fs.xf_lut[0, :, 3:4] * 0.6], axis=1
    )
    kn = compress_pwl([lut])
    assert kn is not None and kn.tau == (True,)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent / 0.5)))
    a = np.asarray(render_slabs_camera(grids, fs, cfg, cam, 24, 24))
    fsd = jax.tree.map(jnp.asarray, fs)  # device fs -> dense path
    b = np.asarray(render_slabs_camera(grids, fsd, cfg, cam, 24, 24))
    assert a[:, 3].max() > 0.1
    np.testing.assert_allclose(a, b, atol=8e-3)


def test_adaptive_stride_converges(amr_fixture):
    """Adaptive z-stride (coarse-only tiles take wider steps, like the
    reference's per-region dt scaling) stays close to the unit-stride
    sweep on a scene with a coarse-only z range."""
    from owlexabrick_tpu.render.slabs import render_slabs_camera

    # level-0 block z in [0,4), level-1 block z in [4,12): slabs past
    # the level-0 tent support are coarse-only and admit stride 2
    text = "0 0 0 4 4 4 0 0 1 2 3 4 5 6 7\n0 0 4 2 2 4 1 2 3 4 5 2 3 4 5\n"
    scene, bricks, grids = _build(amr_fixture, text)
    assert len(grids.levels) == 2
    cam = Camera.look_at([2.0, 2.0, 34.0], [2.0, 2.0, 4.0], [0, 1, 0],
                         26.0, 16, 16)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.5, opacity_scale=0.5)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(
        num_channels=1, nslabs=int(np.ceil(extent / 0.5)), chunk=8
    )
    a = np.asarray(render_slabs_camera(grids, fs, cfg, cam, 16, 16))
    b = np.asarray(render_slabs_camera(
        grids, fs, dataclasses.replace(cfg, adaptive_stride=True),
        cam, 16, 16,
    ))
    assert a[:, 3].max() > 0.2
    # quadrature coarsens only where the reference's would; images agree
    # to a small tolerance and exactly where only the fine level is seen
    np.testing.assert_allclose(a, b, atol=0.05)


def test_y_window_hints_exact(amr_fixture):
    """Per-row-tile y-windowed mids (static ky_hints) are bit-exact vs
    the full-row kernel: windows cover every lattice row a tile's tent
    weights can reach, and zero-padded rows contribute nothing."""
    from owlexabrick_tpu.render.slabs import (
        compress_pwl,
        ky_hints_for_camera,
        render_slabs,
    )

    text = (
        "0 0 0 16 16 16 0 0 1 2 3 4 5 6 7\n"
        "0 0 16 8 8 8 1 3 4 5 6 3 4 5 6\n"
    )
    scene, bricks, grids = _build(amr_fixture, text)
    cam = Camera.look_at([8.0, 8.0, 80.0], [8.0, 8.0, 16.0], [0, 1, 0],
                         10.0, 32, 32)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7, opacity_scale=0.8)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent / 0.7)),
                     tile_rows=8, flip=True)
    pos, dir00, du, dv = permute_camera(cam, 2)
    hints = ky_hints_for_camera(grids, cfg, pos, dir00, dv, 32, 32)
    assert hints is not None and all(h % 16 == 0 for h in hints)
    lut = np.concatenate(
        [fs.xf_lut[0, :, :3], fs.xf_lut[0, :, 3:4] * 0.8], axis=1
    )
    kn = compress_pwl([lut])
    f = jax.jit(
        render_slabs, static_argnames=("cfg", "width", "height", "ky_hints")
    )
    args = (grids, fs, cfg, jnp.asarray(pos), jnp.asarray(dir00),
            jnp.asarray(du), jnp.asarray(dv), 32, 32)
    b = np.asarray(f(*args, knots=kn, ky_hints=None))
    assert b[:, 3].max() > 0.2
    # the 8-row window is tighter than level 0's 16 rows -> windowed path
    a = np.asarray(f(*args, knots=kn, ky_hints=(8, 8)))
    np.testing.assert_array_equal(a, b)
    # dense classification through the windowed kernel too
    a2 = np.asarray(f(*args, knots=None, ky_hints=(8, 8)))
    b2 = np.asarray(f(*args, knots=None, ky_hints=None))
    np.testing.assert_array_equal(a2, b2)


@pytest.mark.slow
def test_late_x_bit_identical(amr_fixture):
    """Window-then-resample camera products (SlabConfig.late_x) are
    bit-exact vs the base pipeline in every layout: the y-window slices
    ride non-contracted axes of both resample einsums, so applying the
    x tents after the slicing is algebraically the same contraction per
    output element.  Covers windowed + full levels, concat on/off,
    adaptive stride (whose grouping consumes the lattice-projected
    activity tables), and the cached-products path."""
    from owlexabrick_tpu.render.slabs import compress_pwl, render_slabs

    text = (
        "0 0 0 16 16 16 0 0 1 2 3 4 5 6 7\n"
        "0 0 16 8 8 8 1 3 4 5 6 3 4 5 6\n"
    )
    scene, bricks, grids = _build(amr_fixture, text)
    cam = Camera.look_at([8.0, 8.0, 80.0], [8.0, 8.0, 16.0], [0, 1, 0],
                         10.0, 32, 32)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7, opacity_scale=0.8)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    pos, dir00, du, dv = permute_camera(cam, 2)
    lut = np.concatenate(
        [fs.xf_lut[0, :, :3], fs.xf_lut[0, :, 3:4] * 0.8], axis=1
    )
    kn = compress_pwl([lut])
    f = jax.jit(
        render_slabs,
        static_argnames=("cfg", "width", "height", "ky_hints", "kx_hints"),
    )
    args = (grids, fs)
    cargs = (jnp.asarray(pos), jnp.asarray(dir00), jnp.asarray(du),
             jnp.asarray(dv), 32, 32)
    for concat in (True, False):
        for stride in (True, False):
            cfg0 = SlabConfig(
                num_channels=1, nslabs=int(np.ceil(extent / 0.7)),
                tile_rows=8, flip=True, concat_levels=concat,
                adaptive_stride=stride,
            )
            # hints force the windowed layout on the 16-row level while
            # the 8^3 level stays full — both emit paths exercise
            base = np.asarray(f(
                *args, dataclasses.replace(cfg0, late_x=False), *cargs,
                knots=kn, ky_hints=(8, 8), kx_hints=(8, 8)))
            late = np.asarray(f(
                *args, dataclasses.replace(cfg0, late_x=True), *cargs,
                knots=kn, ky_hints=(8, 8), kx_hints=(8, 8)))
            assert base[:, 3].max() > 0.2
            np.testing.assert_array_equal(late, base)

    # cached-products path builds the same ChunkPrep through late_x
    cfg = SlabConfig(num_channels=1, nslabs=16, chunk=4,
                     extent_z=extent, adaptive_stride=True, late_x=True)
    cache = {}
    first = np.asarray(render_slabs_camera(grids, fs, cfg, cam, 24, 24,
                                           camera_cache=cache))
    assert "key" in cache and cache["products"] is not None
    live_base = np.asarray(render_slabs_camera(
        grids, fs, dataclasses.replace(cfg, late_x=False), cam, 24, 24))
    np.testing.assert_array_equal(first, live_base)


@pytest.mark.slow
def test_dma_mids_bit_identical(amr_fixture):
    """DMA-window mids (SlabConfig.dma_mids): the kernel copies its own
    y-windows from plain HBM mids instead of consuming pre-windowed /
    hi_lo-split / concatenated blocks.  On CPU (interpret mode, ordered
    f32 accumulation) the output is bit-exact vs the copy pipeline in
    every layout: the DMA windows contain the same nonzero-weight rows
    plus exact zero-weight padding.  (On the MXU the differing K
    partition reorders sums at ulp level — documented in
    pallas_sweep.py's module docstring.)"""
    from owlexabrick_tpu.render.slabs import compress_pwl, render_slabs

    text = (
        "0 0 0 16 16 16 0 0 1 2 3 4 5 6 7\n"
        "0 0 16 8 8 8 1 3 4 5 6 3 4 5 6\n"
    )
    scene, bricks, grids = _build(amr_fixture, text)
    cam = Camera.look_at([8.0, 8.0, 80.0], [8.0, 8.0, 16.0], [0, 1, 0],
                         10.0, 32, 32)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7, opacity_scale=0.8)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    pos, dir00, du, dv = permute_camera(cam, 2)
    lut = np.concatenate(
        [fs.xf_lut[0, :, :3], fs.xf_lut[0, :, 3:4] * 0.8], axis=1
    )
    kn = compress_pwl([lut])
    f = jax.jit(
        render_slabs,
        static_argnames=("cfg", "width", "height", "ky_hints", "kx_hints"),
    )
    cargs = (jnp.asarray(pos), jnp.asarray(dir00), jnp.asarray(du),
             jnp.asarray(dv), 32, 32)
    for stride in (True, False):
        for knots in (kn, None):
            cfg0 = SlabConfig(
                num_channels=1, nslabs=int(np.ceil(extent / 0.7)),
                tile_rows=8, flip=True, adaptive_stride=stride,
            )
            base = np.asarray(f(
                grids, fs, dataclasses.replace(cfg0, dma_mids=False),
                *cargs, knots=knots, ky_hints=(8, 8), kx_hints=(8, 8)))
            dmar = np.asarray(f(
                grids, fs, dataclasses.replace(cfg0, dma_mids=True),
                *cargs, knots=knots, ky_hints=(8, 8), kx_hints=(8, 8)))
            assert base[:, 3].max() > 0.2
            np.testing.assert_array_equal(dmar, base)

    # cached-products path: DMA preps store the plain mids + k0y and
    # reproduce the live path bit-for-bit
    cfg = SlabConfig(num_channels=1, nslabs=16, chunk=4,
                     extent_z=extent, adaptive_stride=True, dma_mids=True)
    cache = {}
    first = np.asarray(render_slabs_camera(grids, fs, cfg, cam, 24, 24,
                                           camera_cache=cache))
    assert "key" in cache and cache["products"] is not None
    live = np.asarray(render_slabs_camera(grids, fs, cfg, cam, 24, 24))
    np.testing.assert_array_equal(first, live)


@pytest.mark.slow
def test_kernel_mids_agrees(amr_fixture):
    """Pallas x-resample mids (SlabConfig.kernel_mids): the x tent build
    + contraction move into a kernel per (slab, column-tile)
    (render/pallas_mids.py).  Same tent semantics as the dense einsum —
    max(0, 1-|qx-k|), k in [0, nx) — so output agrees to f32 rounding
    ("highest"; sum order inside one dot may differ from the einsum's)
    and to ~1e-4 for the two-pass bf16 "hi_lo" split.  Pre-padded mids
    (rows to 8, columns to the tile multiple) reproduce prepare_chunk's
    zero pads exactly."""
    from owlexabrick_tpu.render.slabs import render_slabs

    text = (
        "0 0 0 16 16 16 0 0 1 2 3 4 5 6 7\n"
        "0 0 16 8 8 8 1 3 4 5 6 3 4 5 6\n"
    )
    scene, bricks, grids = _build(amr_fixture, text)
    cam = Camera.look_at([8.0, 8.0, 80.0], [8.0, 8.0, 16.0], [0, 1, 0],
                         10.0, 32, 32)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7, opacity_scale=0.8)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    pos, dir00, du, dv = permute_camera(cam, 2)
    f = jax.jit(
        render_slabs,
        static_argnames=("cfg", "width", "height", "ky_hints", "kx_hints"),
    )
    cargs = (jnp.asarray(pos), jnp.asarray(dir00), jnp.asarray(du),
             jnp.asarray(dv), 32, 32)
    for stride in (True, False):
        cfg0 = SlabConfig(
            num_channels=1, nslabs=int(np.ceil(extent / 0.7)),
            tile_rows=8, flip=True, adaptive_stride=stride,
        )
        base = np.asarray(f(
            grids, fs, dataclasses.replace(cfg0, kernel_mids=False),
            *cargs, ky_hints=(8, 8), kx_hints=(8, 8)))
        assert base[:, 3].max() > 0.2
        km = np.asarray(f(
            grids, fs, dataclasses.replace(cfg0, kernel_mids=True),
            *cargs, ky_hints=(8, 8), kx_hints=(8, 8)))
        np.testing.assert_allclose(km, base, atol=5e-5)
        km2 = np.asarray(f(
            grids, fs, dataclasses.replace(
                cfg0, kernel_mids=True, kernel_mids_precision="hi_lo"),
            *cargs, ky_hints=(8, 8), kx_hints=(8, 8)))
        np.testing.assert_allclose(km2, base, atol=2e-3)

    # cached-products path: kernel mids flow through prepare_chunk's
    # pads as no-ops and reproduce the live path bit-for-bit
    cfg = SlabConfig(num_channels=1, nslabs=16, chunk=4,
                     extent_z=extent, adaptive_stride=True,
                     kernel_mids=True)
    cache = {}
    first = np.asarray(render_slabs_camera(grids, fs, cfg, cam, 24, 24,
                                           camera_cache=cache))
    assert "key" in cache and cache["products"] is not None
    live = np.asarray(render_slabs_camera(grids, fs, cfg, cam, 24, 24))
    np.testing.assert_array_equal(first, live)


@pytest.mark.slow
def test_lattice_mids_agrees(amr_fixture):
    """Lattice-block mids (SlabConfig.lattice_mids): HBM keeps
    z-resampled lattice blocks, the kernel DMAs per-row-tile y-windows
    and runs the x tents + first contraction in-kernel (fold_x's math +
    dma_mids' copies).  Same tent semantics as the einsum path, so
    output agrees to f32 rounding at "highest" (sum order inside the
    dots differs) and to ~1e-3 under the in-register hi_lo splits; the
    cached-products path reproduces the live path bit-for-bit."""
    from owlexabrick_tpu.render.slabs import render_slabs

    text = (
        "0 0 0 16 16 16 0 0 1 2 3 4 5 6 7\n"
        "0 0 16 8 8 8 1 3 4 5 6 3 4 5 6\n"
    )
    scene, bricks, grids = _build(amr_fixture, text)
    cam = Camera.look_at([8.0, 8.0, 80.0], [8.0, 8.0, 16.0], [0, 1, 0],
                         10.0, 32, 32)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7, opacity_scale=0.8)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    pos, dir00, du, dv = permute_camera(cam, 2)
    f = jax.jit(
        render_slabs,
        static_argnames=("cfg", "width", "height", "ky_hints", "kx_hints"),
    )
    cargs = (jnp.asarray(pos), jnp.asarray(dir00), jnp.asarray(du),
             jnp.asarray(dv), 32, 32)
    for stride in (True, False):
        for prec, tol in (("highest", 5e-5), ("hi_lo", 2e-3)):
            cfg0 = SlabConfig(
                num_channels=1, nslabs=int(np.ceil(extent / 0.7)),
                tile_rows=8, flip=True, adaptive_stride=stride,
                dot_precision=prec,
            )
            base = np.asarray(f(
                grids, fs, dataclasses.replace(cfg0, lattice_mids=False),
                *cargs, ky_hints=(8, 8), kx_hints=(8, 8)))
            assert base[:, 3].max() > 0.2
            latt = np.asarray(f(
                grids, fs, dataclasses.replace(cfg0, lattice_mids=True),
                *cargs, ky_hints=(8, 8), kx_hints=(8, 8)))
            np.testing.assert_allclose(latt, base, atol=tol)

    # cached-products path: prepared lattice blocks reproduce the live
    # path bit-for-bit (both run the same kernel on the same blocks)
    cfg = SlabConfig(num_channels=1, nslabs=16, chunk=4,
                     extent_z=extent, adaptive_stride=True,
                     lattice_mids=True)
    cache = {}
    first = np.asarray(render_slabs_camera(grids, fs, cfg, cam, 24, 24,
                                           camera_cache=cache))
    assert "key" in cache and cache["products"] is not None
    live = np.asarray(render_slabs_camera(grids, fs, cfg, cam, 24, 24))
    np.testing.assert_array_equal(first, live)


def test_banded_reuse_cache(amr_fixture):
    """Interactive banded mode: per-band host grids are scattered once
    and cached — the second frame pays only upload + render, and the
    image is unchanged."""
    from owlexabrick_tpu.render.slabs import (
        _BAND_GRID_CACHE,
        render_slabs_banded,
    )

    scene, bricks, grids = _build(amr_fixture, EX3)
    cam = Camera.look_at([6.0, 2.0, 30.0], [6.0, 2.0, 2.0], [0, 1, 0],
                         30.0, 16, 16)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.5, opacity_scale=0.7)
    cfg = SlabConfig(num_channels=1, nslabs=24)
    _BAND_GRID_CACHE.clear()
    a = render_slabs_banded(
        bricks, scene.scalars, fs, cfg, cam, 16, 16, n_bands=3,
    )
    assert len(_BAND_GRID_CACHE) == 1
    (key, (pin, _, bands)) = next(iter(_BAND_GRID_CACHE.items()))
    built = sum(1 for v in bands.values() if v is not None)
    assert built >= 2  # bands actually split the volume
    # second frame: same cache entry, same bands dict, same image
    b = render_slabs_banded(
        bricks, scene.scalars, fs, cfg, cam, 16, 16, n_bands=3,
    )
    assert _BAND_GRID_CACHE[key][2] is bands
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_x_window_hints_exact():
    """The column-tiled x-resample (kx_hints) is bit-identical to the
    full einsum: the x tent matrix has <= 2 nonzero entries per column,
    so weights outside the window are exactly zero and the two nonzero
    contributions accumulate in the same order."""
    import dataclasses

    from owlexabrick_tpu.bench_scene import synthetic_volume
    from owlexabrick_tpu.render.slabs import (
        kx_hints_for_camera,
        ky_hints_for_camera,
        render_slabs,
    )
    from owlexabrick_tpu.tools.raw2cells import volume_to_cells

    n = 96
    lower, level, scal = volume_to_cells(synthetic_volume(n), 0.004, 3)
    scene, bricks, *_ = scene_from_cells(lower, level, [scal])
    grids = build_level_grids(bricks, scene.scalars, axis=2)
    w, h = 768, 432
    cam = Camera.look_at([n / 2, n / 2, n * 2.2], [n / 2, n / 2, n / 2],
                         [0, 1, 0], 20.0, w, h)
    fs = make_frame_state(cam, 1, [[0.0, float(scal.max())]], dt=1.0,
                          opacity_scale=0.7)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent)), chunk=12,
                     extent_z=extent, tile_cols=128)
    pos, d00, du, dv = permute_camera(cam, 2)
    ky = ky_hints_for_camera(grids, cfg, pos, d00, dv, h, w)
    kx = kx_hints_for_camera(grids, cfg, pos, d00, du, h, w)
    nxs = [m.shape[2] for m in grids.masks]
    assert any(
        k is not None and 4 * min(k, nx) <= 3 * nx
        for k, nx in zip(kx, nxs)
    ), "windows did not engage; change the test geometry"
    f = jax.jit(render_slabs,
                static_argnames=("cfg", "width", "height", "ky_hints",
                                 "kx_hints"))
    for c in (cfg, dataclasses.replace(cfg, adaptive_stride=True)):
        a = np.asarray(f(grids, fs, c, pos, d00, du, dv, w, h,
                         ky_hints=ky, kx_hints=None))
        b = np.asarray(f(grids, fs, c, pos, d00, du, dv, w, h,
                         ky_hints=ky, kx_hints=kx))
        assert a[:, 3].max() > 0.5
        np.testing.assert_array_equal(a, b)


def test_hi_lo_dot_precision_display_exact():
    """dot_precision="hi_lo" (two single-bf16 kernel passes over a bf16
    hi/lo mid split) must stay far inside one display quantum of the
    HIGHEST reference on single- and multi-channel scenes."""
    import dataclasses

    from owlexabrick_tpu.tools.artificial import parse_grids_text

    ex3 = "0 0 0 4 4 4 1 0 1 2 3 4 5 6 7\n8 0 0 4 4 4 0 1\n"
    lower, level, scal = parse_grids_text(ex3)
    scene, bricks, *_ = scene_from_cells(lower, level, [scal, scal * 2.0])
    grids = build_level_grids(bricks, scene.scalars, axis=2)
    w = h = 64
    cam = Camera.look_at([4, 4, 30], [4, 4, 4], [0, 1, 0], 30.0, w, h)
    fs = make_frame_state(cam, 2, [[0.0, 7.0], [0.0, 14.0]], dt=0.2,
                          opacity_scale=0.5)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    base = SlabConfig(num_channels=2, nslabs=int(np.ceil(extent / 0.2)),
                      chunk=12, extent_z=extent)
    ref = np.asarray(render_slabs_camera(
        grids, fs, dataclasses.replace(base, dot_precision="highest"),
        cam, w, h))
    got = np.asarray(render_slabs_camera(
        grids, fs, dataclasses.replace(base, dot_precision="hi_lo"),
        cam, w, h))
    assert ref[:, 3].max() > 0.5
    assert np.abs(got - ref).max() < 1.0 / 255.0


def test_camera_products_cache_bit_identical(amr_fixture):
    """render_slabs_camera with a camera_cache must (a) populate the
    cache, (b) reuse it at the same pose, (c) reproduce the live path
    bit-for-bit, and (d) invalidate on a camera change — the static-
    pose product cache (the lazy-BVH-rebuild analog,
    exa/OptixRenderer.cpp:533-549)."""
    scene, bricks, grids = _build(amr_fixture, EX3)
    w = h = 24
    cam = Camera.look_at([4.0, 4.0, 26.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, w, h)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=1.0,
                          opacity_scale=0.8)
    extent = float(np.asarray(grids.bounds_hi[0] - grids.bounds_lo[0]))
    cfg = SlabConfig(num_channels=1, nslabs=16, chunk=4,
                     extent_z=extent, adaptive_stride=True)

    live = np.asarray(render_slabs_camera(grids, fs, cfg, cam, w, h))
    cache = {}
    first = np.asarray(render_slabs_camera(grids, fs, cfg, cam, w, h,
                                           camera_cache=cache))
    assert "key" in cache and cache["products"] is not None
    key0 = cache["key"]
    again = np.asarray(render_slabs_camera(grids, fs, cfg, cam, w, h,
                                           camera_cache=cache))
    assert cache["key"] is key0  # same pose: no recompute
    assert np.array_equal(live, first)
    assert np.array_equal(first, again)

    # TF edit keeps the pose key (products are frame-state independent)
    fs2 = dataclasses.replace(fs, xf_opacity_scale=np.float32(0.3))
    out2 = np.asarray(render_slabs_camera(grids, fs2, cfg, cam, w, h,
                                          camera_cache=cache))
    assert cache["key"] is key0
    assert np.array_equal(
        out2,
        np.asarray(render_slabs_camera(grids, fs2, cfg, cam, w, h)),
    )

    # camera change invalidates
    cam2 = Camera.look_at([4.0, 4.0, 30.0], [4.0, 4.0, 4.0], [0, 1, 0],
                          30.0, w, h)
    out3 = np.asarray(render_slabs_camera(grids, fs, cfg, cam2, w, h,
                                          camera_cache=cache))
    assert cache["key"] != key0
    assert np.array_equal(
        out3,
        np.asarray(render_slabs_camera(grids, fs, cfg, cam2, w, h)),
    )


def test_camera_cache_tiered_prefix(amr_fixture):
    """When the full prepared products exceed camera_cache_max_mb, the
    tiered cache keeps a front PREFIX of chunks' kernel inputs and the
    per-frame path finishes the sweep live — output must stay
    bit-identical to the uncached render, and the cache must record the
    tier.  (Reference-scale scenes: the 1024^3 bench scene's full mids
    are ~15 GB, so only a prefix can amortize —
    exa/OptixRenderer.cpp:531-552's lazy-rebuild economics applied to
    the slice that fits.)"""
    scene, bricks, grids = _build(amr_fixture, EX3)
    w = h = 24
    cam = Camera.look_at([4.0, 4.0, 26.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, w, h)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=1.0,
                          opacity_scale=0.8)
    extent = float(np.asarray(grids.bounds_hi[0] - grids.bounds_lo[0]))
    base = SlabConfig(num_channels=1, nslabs=16, chunk=4,
                      extent_z=extent, adaptive_stride=True)
    live = np.asarray(render_slabs_camera(grids, fs, base, cam, w, h))
    assert live[:, 3].max() > 0.1

    # walk the gate down until the tier engages (the est for this tiny
    # scene is a few tens of KB; a gate between one chunk's share and
    # the total forces the partial path)
    cache = {}
    for gate_mb in (0.2, 0.1, 0.05, 0.03, 0.02, 0.012, 0.008, 0.005):
        cfg = dataclasses.replace(base, camera_cache_max_mb=gate_mb)
        cache = {}
        out = np.asarray(render_slabs_camera(grids, fs, cfg, cam, w, h,
                                             camera_cache=cache))
        if "tier" in cache:
            break
    assert "tier" in cache, "no gate engaged the tiered cache"
    assert "key" in cache and cache["products"] is not None
    n_chunks = -(-cfg.nslabs // cfg.chunk)
    # v2 two-tier layout: full preps for the prefix + a lax.map-stacked
    # LIGHT tier (activity/cull/window artifacts, lvl=()) for every
    # other chunk
    prods = cache["products"]
    assert isinstance(prods, dict) and "light_stack" in prods
    assert 1 <= len(prods["full"]) < n_chunks
    lprep, lscale = prods["light_stack"]
    assert lprep.lvl == ()
    assert int(lscale.shape[0]) == n_chunks - len(prods["full"])
    assert "light artifacts" in cache["tier"]
    assert np.array_equal(live, out)

    # second frame at the same pose reuses the prefix
    key0 = cache["key"]
    again = np.asarray(render_slabs_camera(grids, fs, cfg, cam, w, h,
                                           camera_cache=cache))
    assert cache["key"] is key0
    assert np.array_equal(live, again)

    # TF edit at the same pose still bit-identical through the tier
    fs2 = dataclasses.replace(fs, xf_opacity_scale=np.float32(0.3))
    out2 = np.asarray(render_slabs_camera(grids, fs2, cfg, cam, w, h,
                                          camera_cache=cache))
    assert cache["key"] is key0
    assert np.array_equal(
        out2, np.asarray(render_slabs_camera(grids, fs2, cfg, cam, w, h)))


def test_hoisted_tents_bit_identical(amr_fixture):
    """hoist_tents builds the kernel's y-tent weight blocks host-side
    (camera-only, rows-outer grid) with arithmetic mirroring the
    in-kernel build exactly — output must match the default in-kernel
    path bit-for-bit, live and through the camera cache.  (The hoisted
    variant measured slower on TPU and is OFF by default; this pins the
    flag's correctness either way — see PERFORMANCE.md item 12.)"""
    scene, bricks, grids = _build(amr_fixture, EX3)
    w = h = 24
    cam = Camera.look_at([4.0, 4.0, 26.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, w, h)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=1.0,
                          opacity_scale=0.8)
    extent = float(np.asarray(grids.bounds_hi[0] - grids.bounds_lo[0]))
    # pin concat_levels AND dma_mids off: the hoisted blocks mirror the
    # per-level in-kernel tent build (the concat lane builds its
    # combined tent with different-but-equivalent arithmetic, and the
    # DMA lane's K partition reorders the MXU/SIMD accumulation, so
    # bit-identity is only promised against the per-level copy-pipeline
    # grouping)
    base = SlabConfig(num_channels=1, nslabs=16, chunk=4,
                      extent_z=extent, adaptive_stride=True,
                      concat_levels=False, dma_mids=False)
    cfg_h = dataclasses.replace(base, hoist_tents=True)

    plain = np.asarray(render_slabs_camera(grids, fs, base, cam, w, h))
    hoisted = np.asarray(render_slabs_camera(grids, fs, cfg_h, cam, w, h))
    assert plain[:, 3].max() > 0.1
    assert np.array_equal(plain, hoisted)

    cache = {}
    cached = np.asarray(render_slabs_camera(grids, fs, cfg_h, cam, w, h,
                                            camera_cache=cache))
    assert "key" in cache and cache["products"] is not None
    assert np.array_equal(plain, cached)


def test_concat_levels_agrees_and_caches(amr_fixture):
    """concat_levels pre-concatenates the levels' mid blocks along the
    kernel's contraction axis (one dot per component per pass instead of
    one small-K dot per level).  The K-sum accumulates in one pass
    instead of per-level partials, so agreement is to float rounding —
    and the cached-pose path must reproduce the live concat path
    bit-for-bit (same code, prepared inputs)."""
    scene, bricks, grids = _build(
        amr_fixture,
        # coarse 16^3 + fine 8^3 brick: a windowed/full level mix
        "0 0 0 16 16 16 0 0 1 2 3 4 5 6 7\n"
        "0 0 16 8 8 8 1 3 4 5 6 3 4 5 6\n",
    )
    w = h = 24
    cam = Camera.look_at([8.0, 8.0, 80.0], [8.0, 8.0, 16.0], [0, 1, 0],
                         14.0, w, h)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7, opacity_scale=0.8)
    extent = float(np.asarray(grids.bounds_hi[0] - grids.bounds_lo[0]))
    base = SlabConfig(num_channels=1, nslabs=16, chunk=4,
                      extent_z=extent, adaptive_stride=True, tile_rows=8)
    plain = np.asarray(render_slabs_camera(grids, fs, base, cam, w, h))
    assert plain[:, 3].max() > 0.5
    for cfg in (
        dataclasses.replace(base, concat_levels=True),
        dataclasses.replace(base, concat_levels=True, fuse_mids=True),
    ):
        got = np.asarray(render_slabs_camera(grids, fs, cfg, cam, w, h))
        assert np.abs(got - plain).max() < 1e-5

    cfg = dataclasses.replace(base, concat_levels=True)
    cache = {}
    cached = np.asarray(render_slabs_camera(grids, fs, cfg, cam, w, h,
                                            camera_cache=cache))
    assert "key" in cache and cache["products"] is not None
    live = np.asarray(render_slabs_camera(grids, fs, cfg, cam, w, h))
    assert np.array_equal(cached, live)


def test_fold_x_agrees_and_caches(amr_fixture):
    """fold_x keeps LATTICE-space z-resampled blocks in HBM and applies
    the x tent in-kernel as a first MXU contraction — same math order as
    the host path (wz, wx, wy), so agreement is to float rounding:
    ~1e-6 at HIGHEST precision, within hi_lo's own rounding otherwise.
    The cached-pose path must reproduce the live fold path
    bit-for-bit."""
    scene, bricks, grids = _build(
        amr_fixture,
        # coarse 16^3 + fine 8^3 brick: a windowed/full level mix
        "0 0 0 16 16 16 0 0 1 2 3 4 5 6 7\n"
        "0 0 16 8 8 8 1 3 4 5 6 3 4 5 6\n",
    )
    w = h = 24
    cam = Camera.look_at([8.0, 8.0, 80.0], [8.0, 8.0, 16.0], [0, 1, 0],
                         14.0, w, h)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.7, opacity_scale=0.8)
    extent = float(np.asarray(grids.bounds_hi[0] - grids.bounds_lo[0]))
    for prec, tol in (("highest", 1e-5), ("hi_lo", 2e-4)):
        base = SlabConfig(num_channels=1, nslabs=16, chunk=4,
                          extent_z=extent, adaptive_stride=True,
                          tile_rows=8, dot_precision=prec)
        plain = np.asarray(render_slabs_camera(grids, fs, base, cam, w, h))
        assert plain[:, 3].max() > 0.5
        fold_cfg = dataclasses.replace(base, fold_x=True)
        got = np.asarray(render_slabs_camera(grids, fs, fold_cfg, cam, w, h))
        assert np.abs(got - plain).max() < tol

    cfg = dataclasses.replace(
        SlabConfig(num_channels=1, nslabs=16, chunk=4, extent_z=extent,
                   adaptive_stride=True, tile_rows=8), fold_x=True)
    cache = {}
    cached = np.asarray(render_slabs_camera(grids, fs, cfg, cam, w, h,
                                            camera_cache=cache))
    assert "key" in cache and cache["products"] is not None
    live = np.asarray(render_slabs_camera(grids, fs, cfg, cam, w, h))
    assert np.array_equal(cached, live)


def test_renderer_tf_drag_uses_camera_cache(amr_fixture):
    """Repeated frame-0 renders at a stable pose (the TF-drag
    interaction: every edit resets accumulation) must populate and hit
    the renderer's camera-product cache without changing output."""
    scene, bricks, grids = _build(amr_fixture, EX2)
    from owlexabrick_tpu.render.renderer import Renderer

    s = 20
    cam = Camera.look_at([4, 4, 26], [4, 4, 4], [0, 1, 0], 30.0, s, s)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.5,
                          opacity_scale=0.8)
    cfg = RenderConfig(num_channels=1)
    colors = np.asarray(fs.xf_lut[0][:, :3])
    opac = np.asarray(fs.xf_lut[0][:, 3])
    dom = np.asarray(fs.xf_domain[0])

    def run():
        r = Renderer(scene, s, s, cfg=cfg, frame_state=fs)
        assert r.enable_fast_path()
        outs = [np.asarray(r.render())]
        for sc in (0.5, 0.65, 0.8):
            r.update_xf(0, colors, opac, dom, sc)
            outs.append(np.asarray(r.render()))
        return outs, getattr(r, "_cam_cache", None)

    o1, c1 = run()
    o2, c2 = run()
    assert c1 is not None and "key" in c1  # drag pattern engaged it
    for a, b in zip(o1, o2):
        assert np.array_equal(a, b)


def test_fuse_accum_agrees(amr_fixture):
    """Fused in-kernel framebuffer accumulation (SlabConfig.fuse_accum,
    default ON) must agree with the post-kernel XLA accumulation to
    float-add reordering (the same contribution terms sum left-to-right
    with the carried color moved from last to first — ~1 ulp), on both
    the live (orbit) and cached paths and on the dma and copy lanes."""
    scene, bricks, grids = _build(amr_fixture, EX3)
    w = h = 24
    cam = Camera.look_at([4.0, 4.0, 26.0], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, w, h)
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=1.0,
                          opacity_scale=0.8)
    extent = float(np.asarray(grids.bounds_hi[0] - grids.bounds_lo[0]))
    for dma in (True, False):
        base = SlabConfig(num_channels=1, nslabs=16, chunk=4,
                          extent_z=extent, adaptive_stride=True,
                          dma_mids=dma)
        on = dataclasses.replace(base, fuse_accum=True)
        off = dataclasses.replace(base, fuse_accum=False)
        a = np.asarray(render_slabs_camera(grids, fs, on, cam, w, h))
        b = np.asarray(render_slabs_camera(grids, fs, off, cam, w, h))
        assert a.mean() > 0.01  # non-trivial image
        np.testing.assert_allclose(a, b, atol=3e-6)
        # cached path: products prepared once, fused accumulation in
        # the unrolled chunk loop; must equal its own live path exactly
        cache = {}
        c = np.asarray(render_slabs_camera(grids, fs, on, cam, w, h,
                                           camera_cache=cache))
        assert "key" in cache
        assert np.array_equal(a, c)
