#!/usr/bin/env python
"""Localize the per-frame camera-products cost (the orbit-vs-cached gap).

Times FULL orbit frames (products + kernel in one graph, no camera
cache) with timing-only ablations of the product stage — outputs are
WRONG for the ablated lanes; this measures cost shares, not fidelity:

  full        the real orbit frame (reproduces orbit_breakdown)
  kx8         x windows forced to 8 lattice columns: the x-resample
              einsums + tent builds become ~free -> their share
  nocull      space_skipping=False: drops the TF-cull vrange rows
              (changes kernel gating too — read with that in mind)
  kx8_nocull  both

Usage: python benchmarks/products_ablate.py [volume] [frames] [rounds] [scene]
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
        NUM_XF_VALUES,
        SlabConfig,
        compress_pwl,
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
    scene_kind = sys.argv[4] if len(sys.argv) > 4 else "blobs"
    width, height = 1920, 1080

    grids_host, meta = slab_scene_grids(scene_kind, n)
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

    scale = float(fs.xf_opacity_scale)
    luts_np = [np.concatenate(
        [fs.xf_lut[c, :, :3], fs.xf_lut[c, :, 3:4] * scale], axis=1)
        for c in range(cfg.num_channels)]
    knots = compress_pwl(luts_np, fit_tol=cfg.xf_fit_quantum / 255.0)

    f = jax.jit(render_slabs, static_argnames=(
        "cfg", "width", "height", "ky_hints", "kx_hints",
        "return_products"))

    from owlexabrick_tpu.render import slabs as slabs_mod

    def make(cfg_, xh, mid_prec=None):
        def run():
            slabs_mod._MID_PRECISION_OVERRIDE = mid_prec
            try:
                outs = [f(grids, fs, cfg_, pos, dir00, du, dv,
                          width, height, knots=knots, ky_hints=hints,
                          kx_hints=xh)
                        for _ in range(frames)]
                np.asarray(jnp.stack([o[:1, 0] for o in outs]).sum())
            finally:
                slabs_mod._MID_PRECISION_OVERRIDE = None

        return run

    nocull = dataclasses.replace(cfg, space_skipping=False)
    # the precision lanes vary an unused-in-render_slabs static field so
    # each override value compiles its own graph (jit keys on cfg)
    lanes = {
        "full": make(cfg, xhints),
        "kx8": make(cfg, kx8),
        "nocull": make(nocull, xhints),
        "kx8_nocull": make(nocull, kx8),
        # mid-einsum MXU pass count: 1 / 3 / 6 bf16 passes — if the
        # product einsums bound the orbit frame, time scales with this
        "midprec1": make(dataclasses.replace(
            cfg, camera_cache_max_mb=1001), xhints, "default"),
        "midprec6": make(dataclasses.replace(
            cfg, camera_cache_max_mb=1006), xhints, "highest"),
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
