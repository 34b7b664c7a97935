#!/usr/bin/env python
"""Interleaved A/B for fused framebuffer accumulation
(SlabConfig.fuse_accum), orbit and cached lanes.

fuse_accum=True: the megakernel's compositing carry starts from the
earlier chunks' accumulated rgb/alpha tiles and hands back the totals —
the per-chunk `color + chunk_rgb` / `1 - trans` XLA fusions and the
chunk_rgb intermediate (~80 MB/chunk at 1080p) never touch HBM.
False (default — measured faster, PERFORMANCE.md note 35): the kernel
emits this chunk's premultiplied contribution and XLA accumulates, as
in rounds 1-4.  Outputs agree to float-add reordering (~1 ulp; the CPU
gate in tests/test_slabs.py pins < 3e-6).

Usage: python benchmarks/ab_accfuse.py [volume] [frames] [rounds]
                                       [scene] [lane,lane,...]
Lanes: {orbit,cached}_{fuse,post}
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from owlexabrick_tpu.bench_scene import slab_scene_grids
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.slabs import SlabConfig, render_slabs_camera
    from owlexabrick_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    scene_kind = sys.argv[4] if len(sys.argv) > 4 else "blobs"
    width, height = 1920, 1080

    t0 = time.time()
    grids_host, meta = slab_scene_grids(scene_kind, n)
    grids = jax.tree.map(jnp.asarray, grids_host)
    print(f"# build/load {time.time()-t0:.0f}s", file=sys.stderr)

    cam = Camera.look_at(
        from_=[n / 2, n / 2, n * 2.2], at=[n / 2, n / 2, n / 2],
        up=[0, 1, 0], fovy_degrees=45.0, width=width, height=height,
    )
    fs = make_frame_state(
        cam, 1, [[0.0, float(meta["value_max"])]], dt=1.0,
        opacity_scale=0.7,
    )
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    base = SlabConfig(
        num_channels=1, nslabs=int(np.ceil(extent / 1.0)), chunk=24,
        extent_z=extent, adaptive_stride=True,
        camera_cache_max_mb=8192,
    )
    cfgs = {
        "fuse": dataclasses.replace(base, fuse_accum=True),
        "post": dataclasses.replace(base, fuse_accum=False),
    }
    lanes = {}
    for tag, cfg in cfgs.items():
        lanes[f"orbit_{tag}"] = (cfg, None)
        lanes[f"cached_{tag}"] = (cfg, {})
    if len(sys.argv) > 5:
        keep = sys.argv[5].split(",")
        lanes = {k: v for k, v in lanes.items() if k in keep}

    ref_img = None
    for k, (cfg, cache) in lanes.items():
        img = np.asarray(render_slabs_camera(
            grids, fs, cfg, cam, width, height,
            camera_cache=cache if cache is not None else None))
        if cache is not None:
            assert "key" in cache, (k, cache.get("declined"))
        if ref_img is None:
            ref_img = img
        else:
            d = np.abs(ref_img - img).max()
            print(f"# {k} max|diff| vs first lane: {d:.2e}",
                  file=sys.stderr)

    def run(cfg, cache):
        outs = [
            render_slabs_camera(grids, fs, cfg, cam, width, height,
                                camera_cache=cache)
            for _ in range(frames)
        ]
        np.asarray(jnp.stack([o[:1, 0] for o in outs]).sum())

    best = {k: np.inf for k in lanes}
    for k, (cfg, cache) in lanes.items():
        run(cfg, cache)  # compile + warm
        print(f"# warmed {k}", file=sys.stderr)
    for r in range(rounds):
        for k, (cfg, cache) in lanes.items():
            t0 = time.time()
            run(cfg, cache)
            dt = (time.time() - t0) / frames
            best[k] = min(best[k], dt)
            print(f"# round {r} {k}: {1.0/dt:.2f} FPS", file=sys.stderr)
    for k in lanes:
        print(f"{k}: {1.0/best[k]:.2f} FPS ({best[k]*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
