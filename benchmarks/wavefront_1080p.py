#!/usr/bin/env python
"""Packed-wavefront 1080p frame timing (VERDICT r2 task 7 'Done' bar:
one exact wavefront frame <= 1 s on the bench scene, from ~4 s for the
un-binned integrator).

Renders ONE 1080p frame of the 64^3 bench scene through the binned/
compacted packed wavefront (render/wavefront.py) in ray tiles (large-P
graphs hold multi-GB gather temporaries that can crash the dev-tunnel
TPU worker — tiling keeps each graph's footprint bounded and lets the
queue compaction bite earlier).

Usage: python benchmarks/wavefront_1080p.py [tiles] [round_iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from owlexabrick_tpu.bench_scene import synthetic_volume
    from owlexabrick_tpu.pipeline import scene_from_cells
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.dvr import RenderConfig
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.scene import to_device
    from owlexabrick_tpu.render.slabs import build_level_grids
    from owlexabrick_tpu.render.wavefront import (
        build_pack,
        trace_dvr_packed_compacted,
    )

    tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    round_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n, width, height = 64, 1920, 1080

    t0 = time.time()
    vol = synthetic_volume(n)
    from owlexabrick_tpu.tools.raw2cells import volume_to_cells

    lower, level, scal = volume_to_cells(vol, 0.004, 3)
    scene, bricks, *_ = scene_from_cells(lower, level, [scal])
    grids = build_level_grids(bricks, scene.scalars, axis=2)
    dscene = to_device(scene)
    pack = build_pack(dscene, grids)
    print(f"# build {time.time()-t0:.1f}s", file=sys.stderr)

    cam = Camera.look_at(
        from_=[n / 2, n / 2, n * 2.2], at=[n / 2, n / 2, n / 2],
        up=[0, 1, 0], fovy_degrees=45.0, width=width, height=height,
    )
    fs = make_frame_state(
        cam, 1, [[0.0, float(scal.max())]], dt=1.0, opacity_scale=0.7
    )
    import jax

    fs = jax.tree.map(jnp.asarray, fs)
    cfg = RenderConfig(num_channels=1)
    o, d = cam.rays(width, height)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    offset = jnp.full(width * height, 0.5, jnp.float32)

    p = width * height
    tsz = -(-p // tiles)

    def frame():
        outs = []
        for ti in range(tiles):
            i0 = ti * tsz
            i1 = min(p, i0 + tsz)
            outs.append(np.asarray(trace_dvr_packed_compacted(
                pack, dscene, fs, cfg, o[i0:i1], d[i0:i1], offset[i0:i1],
                round_iters=round_iters,
            )))
        return np.concatenate(outs)

    t0 = time.time()
    img = frame()  # compile + first frame
    first = time.time() - t0
    t0 = time.time()
    img = frame()
    warm = time.time() - t0
    print(f"# alpha coverage {float((img[:, 3] > 0.01).mean()):.2f}",
          file=sys.stderr)
    print(f"wavefront_1080p: first {first:.1f}s (incl. compile), "
          f"warm {warm:.2f}s/frame ({tiles} tiles, "
          f"round_iters {round_iters})")


if __name__ == "__main__":
    main()
