#!/usr/bin/env python
"""Chunk-depth A/B at the 1024^3 scale scene (resident grids).

The scale scene runs cfg.nslabs/chunk ~ 86+ chunks per frame at the
default chunk=12; per-chunk fixed costs (launch, z-window slices, carry)
were the suspected majority of its frame time.  Interleaved lanes:
cached/orbit x chunk {12, 24, 32} (budget raised to match).

Usage: python benchmarks/scale_chunk.py [frames] [rounds]
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

    from owlexabrick_tpu.bench_scene import load_or_build_scale_scene
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.slabs import SlabConfig, render_slabs_camera
    from owlexabrick_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n = 1024
    width, height = 1920, 1080

    t0 = time.time()
    bricks, scalars, grids_host, meta = load_or_build_scale_scene(n, 2)
    print(f"# scene load {time.time()-t0:.0f}s: {meta['n_cells']} cells",
          file=sys.stderr, flush=True)
    t0 = time.time()
    grids = jax.tree.map(jnp.asarray, grids_host)
    np.asarray(grids.zranges[:1])
    print(f"# upload {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    del bricks, scalars

    cam = Camera.look_at(
        from_=[n / 2, n / 2, n * 2.2], at=[n / 2, n / 2, n / 2],
        up=[0, 1, 0], fovy_degrees=45.0, width=width, height=height,
    )
    fs = make_frame_state(cam, 1, [[0.0, float(meta["value_max"])]],
                          dt=1.0, opacity_scale=0.7)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    base = SlabConfig(
        num_channels=1, nslabs=int(np.ceil(extent)), chunk=12,
        extent_z=extent, adaptive_stride=True,
        camera_cache_max_mb=int(os.environ.get(
            "BENCH_SCALE_CACHE_MB", 5120)),
    )
    cfgs = {
        "c12": base,
        "c24": dataclasses.replace(base, chunk=24, chunk_budget_mb=16),
        "c32": dataclasses.replace(base, chunk=32, chunk_budget_mb=24),
    }
    lanes = {}
    for tag, cfg in cfgs.items():
        lanes[f"orbit_{tag}"] = (cfg, None)
        lanes[f"cached_{tag}"] = (cfg, {})
    if len(sys.argv) > 3:
        keep = sys.argv[3].split(",")
        lanes = {k: v for k, v in lanes.items() if k in keep}

    def run(cfg, cache):
        outs = [
            render_slabs_camera(grids, fs, cfg, cam, width, height,
                                camera_cache=cache)
            for _ in range(frames)
        ]
        np.asarray(jnp.stack([o[:1, 0] for o in outs]).sum())

    best = {k: np.inf for k in lanes}
    for k, (cfg, cache) in lanes.items():
        t0 = time.time()
        run(cfg, cache)
        print(f"# warmed {k} ({time.time()-t0:.0f}s; tier="
              f"{None if cache is None else cache.get('tier')})",
              file=sys.stderr, flush=True)
    for r in range(rounds):
        for k, (cfg, cache) in lanes.items():
            t0 = time.time()
            run(cfg, cache)
            dt = (time.time() - t0) / frames
            best[k] = min(best[k], dt)
            print(f"# round {r} {k}: {1.0/dt:.2f} FPS", file=sys.stderr,
                  flush=True)
    for k in lanes:
        print(f"{k}: {1.0/best[k]:.2f} FPS ({best[k]*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
