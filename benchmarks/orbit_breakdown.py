#!/usr/bin/env python
"""Localize the moving-camera (orbit) frame cost: products vs kernel.

The orbit path re-runs the whole jitted render (camera products + fused
kernel); the static-pose path reuses prepared products and pays only the
kernel.  This times, interleaved:
  frame_cached   render with camera_cache (kernel only)
  products_only  jitted return_products=True call (the orbit overhead)
  frame_orbit    full render, no cache (products + kernel in one graph)
and prep ablations (concat_levels off, windows off) on the orbit path.

Usage: python benchmarks/orbit_breakdown.py [volume] [frames] [rounds]
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

    from owlexabrick_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    from owlexabrick_tpu.bench_scene import slab_scene_grids
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.slabs import SlabConfig, render_slabs_camera

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    width, height = 1920, 1080

    grids_host, meta = slab_scene_grids("blobs", n)
    grids = jax.tree.map(jnp.asarray, grids_host)
    cam = Camera.look_at(
        from_=[n / 2, n / 2, n * 2.2], at=[n / 2, n / 2, n / 2],
        up=[0, 1, 0], fovy_degrees=45.0, width=width, height=height,
    )
    fs = make_frame_state(cam, 1, [[0.0, meta["value_max"]]], dt=1.0,
                          opacity_scale=0.7)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent)), chunk=12,
                     extent_z=extent, adaptive_stride=True,
                     camera_cache_max_mb=8192)

    cache = {}
    render_slabs_camera(grids, fs, cfg, cam, width, height,
                        camera_cache=cache)

    def t_cached():
        outs = [render_slabs_camera(grids, fs, cfg, cam, width, height,
                                    camera_cache=cache)
                for _ in range(frames)]
        np.asarray(jnp.stack([o[:1, 0] for o in outs]).sum())

    def t_orbit(cfg_=cfg):
        outs = [render_slabs_camera(grids, fs, cfg_, cam, width, height)
                for _ in range(frames)]
        np.asarray(jnp.stack([o[:1, 0] for o in outs]).sum())

    def t_products():
        # fresh dict each call forces the products recompute; the frame
        # itself then runs through the prepared path
        for _ in range(frames):
            c = {}
            render_slabs_camera(grids, fs, cfg, cam, width, height,
                                camera_cache=c)
        np.asarray(
            render_slabs_camera(grids, fs, cfg, cam, width, height,
                                camera_cache=c)[:1, 0])

    variants = {
        "frame_cached": t_cached,
        "products+frame": t_products,
        "frame_orbit": t_orbit,
        "orbit_noconcat": lambda: t_orbit(
            dataclasses.replace(cfg, concat_levels=False)),
        "orbit_nowindow": lambda: t_orbit(
            dataclasses.replace(cfg, y_window=False)),
    }
    if not hasattr(cfg, "y_window"):
        variants.pop("orbit_nowindow")
    if len(sys.argv) > 4:
        keep = sys.argv[4].split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    for k, f in variants.items():
        f()  # compile
    best = {k: np.inf for k in variants}
    for r in range(rounds):
        for k, f in variants.items():
            t0 = time.time()
            f()
            dt = (time.time() - t0) / frames
            best[k] = min(best[k], dt)
            print(f"# round {r} {k}: {dt*1e3:.1f} ms", file=sys.stderr,
                  flush=True)
    for k in variants:
        print(f"{k}: {best[k]*1e3:.1f} ms ({1.0/best[k]:.2f} FPS)")


if __name__ == "__main__":
    main()
