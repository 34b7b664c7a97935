#!/usr/bin/env python
"""Localize the per-frame camera-products cost (the orbit-vs-cached gap).

Times the jitted ``return_products=True`` pass alone, plus timing-only
ablations (outputs are WRONG for the ablated lanes — this measures cost
shares, not fidelity):

  full      the real products pass (what every orbit frame pays)
  kx8       x windows forced to 8 lattice columns: the x-resample einsum
            + tent builds become ~free -> their share of `full`
  nocull    space_skipping=False: drops the TF-cull vrange rows
  kx8_nocull  both

Usage: python benchmarks/products_ablate.py [volume] [frames] [rounds]
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
    from owlexabrick_tpu.render.slabs import (
        SlabConfig,
        kx_hints_for_camera,
        ky_hints_for_camera,
        permute_camera,
        render_slabs,
    )
    from owlexabrick_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
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
    fs = make_frame_state(cam, 1, [[0.0, float(meta["value_max"])]],
                          dt=1.0, opacity_scale=0.7)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent)),
                     chunk=12, extent_z=extent, adaptive_stride=True)

    pos, dir00, du, dv = permute_camera(cam, grids.axis)
    cfg = dataclasses.replace(cfg, flip=bool(dir00[0] < 0))
    hints = ky_hints_for_camera(grids, cfg, pos, dir00, dv, height, width)
    xhints = kx_hints_for_camera(grids, cfg, pos, dir00, du, height, width)
    kx8 = tuple(8 for _ in xhints)
    print(f"# ky_hints={hints} kx_hints={xhints}", file=sys.stderr)

    f = jax.jit(render_slabs, static_argnames=(
        "cfg", "width", "height", "ky_hints", "kx_hints",
        "return_products"))

    def make(cfg_, xh):
        def call():
            prods = f(grids, fs, cfg_, pos, dir00, du, dv, width, height,
                      ky_hints=hints, kx_hints=xh, return_products=True)
            return prods

        def run():
            outs = [call() for _ in range(frames)]
            leaves = [jax.tree.leaves(o)[0] for o in outs]
            np.asarray(jnp.stack([l.ravel()[0] for l in leaves]).sum())

        return run

    nocull = dataclasses.replace(cfg, space_skipping=False)
    lanes = {
        "full": make(cfg, xhints),
        "kx8": make(cfg, kx8),
        "nocull": make(nocull, xhints),
        "kx8_nocull": make(nocull, kx8),
    }
    best = {k: np.inf for k in lanes}
    for k, run in lanes.items():
        run()
        print(f"# warmed {k}", file=sys.stderr, flush=True)
    for r in range(rounds):
        for k, run in lanes.items():
            t0 = time.time()
            run()
            dt = (time.time() - t0) / frames
            best[k] = min(best[k], dt)
            print(f"# round {r} {k}: {dt*1e3:.1f} ms", file=sys.stderr,
                  flush=True)
    for k in lanes:
        print(f"{k}: {best[k]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
