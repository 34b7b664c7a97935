"""Scene-sharded multi-chip mode: z-bands of the level grids live on
separate devices and composite front-to-back with a ppermute parallel
prefix — the device-resident analog of render_slabs_banded.  Band-sharded
output must equal the replicated single-device render."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlexabrick_tpu.parallel.mesh import (
    build_band_grids,
    make_band_mesh,
    make_band_sharded_slab_renderer,
    shard_bands,
)
from owlexabrick_tpu.pipeline import scene_from_cells
from owlexabrick_tpu.render.camera import Camera
from owlexabrick_tpu.render.frame import make_frame_state
from owlexabrick_tpu.render.slabs import (
    SlabConfig,
    build_level_grids,
    permute_camera,
    render_slabs_banded,
    render_slabs_camera,
)
from owlexabrick_tpu.tools.artificial import parse_grids_text

from conftest import EX2, EX3


@pytest.mark.parametrize("text,flip_dir", [(EX2, 1.0), (EX3, 1.0),
                                           (EX2, -1.0)])
@pytest.mark.slow
def test_band_sharded_matches_single_device(text, flip_dir):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    lower, level, scal = parse_grids_text(text)
    scene, bricks, *_ = scene_from_cells(lower, level, [scal])
    size = 16
    zcam = 30.0 * flip_dir + 4.0
    cam = Camera.look_at([4.0, 4.0, zcam], [4.0, 4.0, 4.0], [0, 1, 0],
                         30.0, size, size)
    # control-point colormap: its PWL compression is exact, so the
    # compressed (single/banded) and dense (band-sharded) classifications
    # are bit-identical (the embedded Jet strip compresses only to 1/255)
    from owlexabrick_tpu.viewer.colormaps import ColorMapper

    cmap = ColorMapper.from_string(
        "0.0,(0,0,0.6)\n0.35,(0,0.8,0.9)\n0.7,(1,0.9,0)\n1.0,(0.8,0,0)"
    )
    fs = make_frame_state(cam, 1, [[0.0, 7.0]], dt=0.3, opacity_scale=0.6,
                          colormap=cmap)

    grids = build_level_grids(bricks, scene.scalars, axis=2)
    pos, dir00, du, dv = permute_camera(cam, 2)
    flip = bool(dir00[0] < 0)
    nslabs = 64
    cfg = SlabConfig(num_channels=1, nslabs=nslabs, chunk=8, flip=flip)

    single = np.asarray(render_slabs_camera(
        grids, fs, cfg, cam, size, size
    ))

    n_bands = 8
    stacked, meta = build_band_grids(bricks, scene.scalars, n_bands,
                                     nslabs, axis=2)
    mesh = make_band_mesh(n_bands)
    f = make_band_sharded_slab_renderer(mesh, cfg, meta, size, size)
    out = np.asarray(f(
        shard_bands(mesh, stacked),
        jax.tree.map(jnp.asarray, fs),
        jnp.asarray(pos), jnp.asarray(dir00), jnp.asarray(du),
        jnp.asarray(dv),
    ))

    # band boundaries lie on the global slab lattice: the sharded
    # composite is the same quadrature, only the band z-ranges and the
    # prefix combine differ (float tolerance)
    np.testing.assert_allclose(out, single, rtol=1e-4, atol=2e-5)

    # also equals the sequential host-streamed banded renderer
    vcam = cam
    banded = render_slabs_banded(
        bricks, scene.scalars, fs, cfg, vcam, size, size,
        n_bands=n_bands, axis=2,
    )
    np.testing.assert_allclose(out, banded, rtol=1e-4, atol=2e-5)


def test_banded_peak_memory_bounded():
    """Out-of-core guarantee: with bricks distributed along z, the banded
    renderer's device-resident grid peak is a fraction of the full grids
    (bands only build the bricks whose basis support reaches them)."""
    # four separate 8^3 level-0 blocks stacked along z
    text = "".join(
        f"0 0 {16 * k} 8 8 8 0 {0.1 * (k + 1):.2f}\n" for k in range(4)
    )
    lower, level, scal = parse_grids_text(text)
    scene, bricks, *_ = scene_from_cells(lower, level, [scal])
    size = 8
    cam = Camera.look_at([4.0, 4.0, 90.0], [4.0, 4.0, 28.0], [0, 1, 0],
                         40.0, size, size)
    fs = make_frame_state(cam, 1, [[0.0, 1.0]], dt=0.5, opacity_scale=0.5)
    pos, dir00, *_ = permute_camera(cam, 2)
    cfg = SlabConfig(num_channels=1, nslabs=64, chunk=8,
                     flip=bool(dir00[0] < 0))
    mem = {}
    render_slabs_banded(bricks, scene.scalars, fs, cfg, cam, size, size,
                        n_bands=8, axis=2, mem_stats=mem)
    grids = build_level_grids(bricks, scene.scalars, axis=2)
    full_bytes = sum(
        int(np.prod(np.asarray(v).shape)) * 4 for v in grids.vals
    ) + sum(int(np.prod(np.asarray(m).shape)) * 4 for m in grids.masks)
    # 4 separated blocks -> a band holds at most ~1 block (+ overlap)
    assert mem["peak_band_bytes"] <= full_bytes * 0.5, (
        mem["peak_band_bytes"], full_bytes,
    )
