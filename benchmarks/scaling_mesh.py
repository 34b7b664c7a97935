#!/usr/bin/env python
"""Multi-device scaling measurement on the virtual CPU mesh.

The dev environment has ONE TPU chip and ONE host vCPU, so N-chip
wall-clock speedup cannot be measured directly.  What the 1-core
8-virtual-device mesh DOES measure rigorously is the other side of the
scaling ledger: with all devices serialized onto one core, the wall
clock T_N is the TOTAL work+overhead of the N-way sharded program.

  T_N / T_1 ~ 1.0  =>  sharding adds no redundant compute and no
                       material communication; on N real chips each
                       device runs T_N/N of serialized work, so the
                       parallel efficiency is ~ T_1 / T_N.
  T_N / T_1 > 1    =>  the excess IS the sharding overhead (comm,
                       padding, re-replication), measured exactly.

Two modes, per VERDICT r4 task 1:
  px    pixel-band sharding (scene replicated) — the production
        scale-out; zero inter-device traffic until the final gather
  band  scene-sharded z-bands — ppermute ring compositing; per-frame
        ICI traffic = (N-1) x H x W x 16 B of framebuffer hops

Usage: python benchmarks/scaling_mesh.py [volume] [frames] [WxH] [scene]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from owlexabrick_tpu.bench_scene import slab_scene_grids
    from owlexabrick_tpu.parallel.mesh import (
        build_band_grids, make_band_mesh,
        make_band_sharded_slab_renderer, make_sharded_slab_renderer,
        shard_bands,
    )
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.slabs import SlabConfig, permute_camera

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    size = sys.argv[3] if len(sys.argv) > 3 else "960x528"
    scene_kind = sys.argv[4] if len(sys.argv) > 4 else "exajet"
    width, height = (int(v) for v in size.split("x"))

    t0 = time.time()
    grids_host, meta = slab_scene_grids(scene_kind, n)
    grids = jax.tree.map(jnp.asarray, grids_host)
    print(f"# {scene_kind}{n}: {meta['n_cells']} cells, build "
          f"{time.time()-t0:.0f}s, {len(jax.devices())} virtual devices",
          file=sys.stderr)

    cam = Camera.look_at(
        from_=[n / 2, n / 2, n * 2.2], at=[n / 2, n / 2, n / 2],
        up=[0, 1, 0], fovy_degrees=45.0, width=width, height=height,
    )
    fs = make_frame_state(cam, 1, [[0.0, float(meta["value_max"])]],
                          dt=1.0, opacity_scale=0.7)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(
        num_channels=1, nslabs=int(np.ceil(extent)), chunk=12,
        extent_z=extent, adaptive_stride=True,
    )
    pos, dir00, du, dv = permute_camera(cam, grids.axis)
    import dataclasses

    cfg = dataclasses.replace(cfg, flip=bool(dir00[0] < 0))
    key = jax.random.PRNGKey(0)

    results = {}
    for nd in (1, 2, 4, 8):
        mesh = Mesh(
            np.asarray(jax.devices()[:nd]).reshape(nd, 1), ("px", "spp")
        )
        f = make_sharded_slab_renderer(mesh, cfg, width, height,
                                       jitter=False)
        out = f(grids, fs, pos, dir00, du, dv, key)
        np.asarray(out[:1])  # compile + warm
        t0 = time.time()
        for _ in range(frames):
            out = f(grids, fs, pos, dir00, du, dv, key)
        np.asarray(out[:1])
        dt = (time.time() - t0) / frames
        results[nd] = dt
        print(f"px nd={nd}: {dt*1e3:.0f} ms/frame "
              f"(T_N/T_1 = {dt/results[1]:.3f})", flush=True)

    # scene-sharded z-bands (only meaningful for nd >= 2): rebuild the
    # scene's bricks + scalars (the grid cache keeps only level grids)
    from owlexabrick_tpu.bench_scene import (
        exajet_pattern_volume, synthetic_volume, volume_to_cells,
    )

    vol = (exajet_pattern_volume(n) if scene_kind == "exajet"
           else synthetic_volume(n))
    lower, level, scal = volume_to_cells(vol, 0.004, 3)
    try:
        from owlexabrick_tpu.native import (
            available, native_build_bricks_flat,
        )

        assert available()
        bricks, cell_ids = native_build_bricks_flat(lower, level)
    except Exception:
        from owlexabrick_tpu.builder.bricker import build_bricks
        from owlexabrick_tpu.pipeline import bricks_from_build

        bricks, cell_ids = bricks_from_build(build_bricks(lower, level))
    scalars = scal[np.asarray(cell_ids, np.int64)][None].astype(
        np.float32)
    if True:
        bres = {}
        for nd in (2, 4, 8):
            mesh = make_band_mesh(nd)
            stacked, bmeta = build_band_grids(
                bricks, scalars, nd, cfg.nslabs)
            f = make_band_sharded_slab_renderer(
                mesh, cfg, bmeta, width, height)
            sh = shard_bands(mesh, stacked)
            out = f(sh, fs, pos, dir00, du, dv)
            np.asarray(out[:1])
            t0 = time.time()
            for _ in range(frames):
                out = f(sh, fs, pos, dir00, du, dv)
            np.asarray(out[:1])
            dt = (time.time() - t0) / frames
            bres[nd] = dt
            print(f"band nd={nd}: {dt*1e3:.0f} ms/frame "
                  f"(vs px T_1: {dt/results[1]:.3f})", flush=True)


if __name__ == "__main__":
    main()
