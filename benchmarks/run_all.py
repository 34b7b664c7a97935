#!/usr/bin/env python
"""Extended benchmark sweep: both render paths across volume sizes and
resolutions; prints a markdown table (bench.py remains the one-line
headline the driver consumes)."""

import sys
import time

import numpy as np


def timed(f, n=8):
    f()  # warm-up/compile
    t0 = time.time()
    for _ in range(n):
        f()
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from owlexabrick_tpu.bench_scene import synthetic_volume
    from owlexabrick_tpu.pipeline import scene_from_cells
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.dvr import RenderConfig, trace_dvr
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.scene import to_device
    from owlexabrick_tpu.render.slabs import (
        SlabConfig,
        build_level_grids,
        render_slabs_camera,
    )
    from owlexabrick_tpu.tools.raw2cells import volume_to_cells

    print("| volume | resolution | path | ms/frame | FPS | Mray/s |")
    print("|---|---|---|---|---|---|")

    for n, max_level in [(32, 3), (64, 3), (128, 4)]:
        vol = synthetic_volume(n)
        lower, level, scal = volume_to_cells(vol, 0.004, max_level)
        scene, bricks, *_ = scene_from_cells(lower, level, [scal])
        grids = build_level_grids(bricks, scene.scalars, axis=2)
        dscene = to_device(scene)

        for (w, h) in [(1920, 1080), (960, 540)]:
            cam = Camera.look_at(
                [n / 2, n / 2, n * 2.2], [n / 2, n / 2, n / 2], [0, 1, 0],
                45.0, w, h,
            )
            fs = jax.tree.map(
                jnp.asarray,
                make_frame_state(cam, 1, [[0.0, float(scal.max())]],
                                 dt=1.0, opacity_scale=0.7),
            )
            extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
            cfg = SlabConfig(nslabs=int(np.ceil(extent)), chunk=24)

            def slab():
                r = render_slabs_camera(grids, fs, cfg, cam, w, h)
                np.asarray(r[:4])

            dt = timed(slab)
            print(f"| {n}^3 | {w}x{h} | slab | {dt*1e3:.0f} | "
                  f"{1/dt:.1f} | {w*h/dt/1e6:.0f} |")
            sys.stdout.flush()

        # wavefront at low resolution only (it is the exact/slow path)
        w, h = 128, 128
        cam = Camera.look_at(
            [n * 1.7, n * 1.4, n * 1.9], [n / 2, n / 2, n / 2], [0, 1, 0],
            45.0, w, h,
        )
        fs = jax.tree.map(
            jnp.asarray,
            make_frame_state(cam, 1, [[0.0, float(scal.max())]],
                             dt=1.0, opacity_scale=0.7),
        )
        o, d = cam.rays(w, h)
        o, d = jnp.asarray(o), jnp.asarray(d)
        off = jnp.zeros(o.shape[0])
        f = jax.jit(trace_dvr, static_argnames="cfg")
        rcfg = RenderConfig(num_channels=1)

        def wave():
            np.asarray(f(dscene, fs, rcfg, o, d, off)[:4])

        dt = timed(wave, n=3)
        print(f"| {n}^3 | {w}x{h} | wavefront (exact) | {dt*1e3:.0f} | "
              f"{1/dt:.2f} | {w*h/dt/1e6:.2f} |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
