#!/usr/bin/env python
"""Adaptive z-stride fidelity survey (VERDICT r2 weak #6).

The stride is the slab form of the reference's per-region
dt = global_dt * finestLevelCellWidth (exabrick.cu:1129) — in the
reference it is ALWAYS on.  This survey measures what turning it on
does to the rendered image across the repo's test scenes, to justify
flipping the user-facing default.

Usage: python benchmarks/stride_survey.py
Prints one row per (scene, dt): rgba8-scale error stats stride-on vs
stride-off (the exact uniform-slab quadrature).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np


def main():
    from owlexabrick_tpu.bench_scene import (
        exajet_pattern_volume,
        synthetic_volume,
    )
    from owlexabrick_tpu.pipeline import scene_from_cells
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.slabs import (
        SlabConfig,
        build_level_grids,
        render_slabs_camera,
    )
    from owlexabrick_tpu.tools.artificial import parse_grids_text
    from owlexabrick_tpu.tools.raw2cells import volume_to_cells

    EX3 = "0 0 0 4 4 4 1 0 1 2 3 4 5 6 7\n8 0 0 4 4 4 0 1\n"
    EX4 = "0 0 0 4 4 4 0 0 1 0 1 0 1 0 1\n4 0 0 2 2 2 1 2\n"

    def from_text(text):
        lower, level, scal = parse_grids_text(text)
        scene, bricks, *_ = scene_from_cells(lower, level, [scal])
        return bricks, scene.scalars, float(np.asarray(scal).max())

    def from_volume(vol):
        lower, level, scal = volume_to_cells(vol, 0.004, 3)
        scene, bricks, *_ = scene_from_cells(lower, level, [scal])
        return bricks, scene.scalars, float(np.asarray(scal).max())

    scenes = {
        "ex3_twolevel": from_text(EX3),
        "ex4_sidebyside": from_text(EX4),
        "blobs48": from_volume(synthetic_volume(48)),
        "exajet64": from_volume(exajet_pattern_volume(64)),
    }

    size = 96
    print(f"{'scene':<16}{'dt':>5}{'max':>6}{'p99':>6}"
          f"{'<1/255':>8}{'<8/255':>8}")
    worst = 0.0
    for name, (bricks, scalars, vmax) in scenes.items():
        grids = build_level_grids(bricks, scalars, axis=2)
        lo = np.asarray(grids.bounds_lo)
        hi = np.asarray(grids.bounds_hi)
        c = 0.5 * (lo + hi)
        cam = Camera.look_at(
            [float(c[2]), float(c[1]), float(hi[0] + 2.2 * (hi[0] - lo[0]))],
            [float(c[2]), float(c[1]), float(c[0])],
            [0, 1, 0], 45.0, size, size,
        )
        extent = float(hi[0] - lo[0])
        finest = float(1 << min(grids.levels))
        for dt in (1.0, 0.5):
            fs = make_frame_state(
                cam, 1, [[0.0, vmax * 1.05]], dt=dt, opacity_scale=0.7
            )
            ns = int(np.ceil(extent / (dt * finest)))
            base = SlabConfig(num_channels=1, nslabs=ns, extent_z=extent)
            a = np.asarray(render_slabs_camera(
                grids, fs, base, cam, size, size))
            b = np.asarray(render_slabs_camera(
                grids, fs, dataclasses.replace(base, adaptive_stride=True),
                cam, size, size))
            d = np.abs(a - b) * 255.0
            mx = float(d.max())
            worst = max(worst, mx)
            print(f"{name:<16}{dt:>5.2f}{mx:>6.1f}"
                  f"{float(np.percentile(d, 99)):>6.1f}"
                  f"{float((d.max(-1) <= 1.0).mean()):>8.3f}"
                  f"{float((d.max(-1) <= 8.0).mean()):>8.3f}")
    print(f"# worst rgba8-scale deviation anywhere: {worst:.1f}/255")


if __name__ == "__main__":
    main()
