#!/usr/bin/env python
"""Real-TPU pixel-band scaling: per-band wall clocks on the one chip.

Pixel-band sharding has ZERO inter-device dependencies until the final
framebuffer gather (make_sharded_slab_renderer: each device sweeps its
horizontal band with a shifted dir00; out_specs=P("px") concatenates).
So an N-chip slice's frame time is max over bands of the band's own
render time, plus the gather (H*W*16/N bytes per device over ICI,
~0.1 ms at 1080p) — and each band's render time can be measured
honestly on ONE chip by rendering the bands sequentially.

For N in {1, 2, 4, 8}: renders each of the N bands of a 1080p frame as
its own sustained batch, reports per-band ms, the slice critical path
max_b(ms), projected slice FPS, and parallel efficiency
T_1 / (N * max_b).

Usage: python benchmarks/scaling_tpu.py [volume] [frames] [scene] [mode]
  mode: orbit (default — per-frame camera products, the moving-camera
        rate) or cached (static pose, per-band product cache)
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
        SlabConfig, render_slabs_camera,
    )
    from owlexabrick_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    scene_kind = sys.argv[3] if len(sys.argv) > 3 else "blobs"
    mode = sys.argv[4] if len(sys.argv) > 4 else "orbit"
    width, height = 1920, 1080

    grids_host, meta = slab_scene_grids(scene_kind, n)
    grids = jax.tree.map(jnp.asarray, grids_host)
    print(f"# {scene_kind}{n}: {meta['n_cells']} cells, mode={mode}",
          file=sys.stderr)

    cam = Camera.look_at(
        from_=[n / 2, n / 2, n * 2.2], at=[n / 2, n / 2, n / 2],
        up=[0, 1, 0], fovy_degrees=45.0, width=width, height=height,
    )
    fs = make_frame_state(cam, 1, [[0.0, float(meta["value_max"])]],
                          dt=1.0, opacity_scale=0.7)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg0 = SlabConfig(
        num_channels=1, nslabs=int(np.ceil(extent)), chunk=12,
        extent_z=extent, adaptive_stride=True, camera_cache_max_mb=8192,
    )

    def band_cam(nd, b):
        """The band's camera: same rays, dir00 shifted to the band's
        first row (exactly make_sharded_slab_renderer.body:
        dir00_b = dir00 + band*rows*dv)."""
        rows = height // nd
        return dataclasses.replace(
            cam, dir00=(np.asarray(cam.dir00)
                        + (b * rows) * np.asarray(cam.dir_dv)).astype(
                            np.float32),
        )

    t1 = None
    for nd in (1, 2, 4, 8):
        rows = height // nd
        band_ms = []
        for b in range(nd):
            bc = band_cam(nd, b)
            cache = {} if mode == "cached" else None
            def render():
                return render_slabs_camera(
                    grids, fs, cfg0, bc, width, rows,
                    camera_cache=cache)
            np.asarray(render()[:1])  # compile + warm

            def batch():
                outs = [render() for _ in range(frames)]
                np.asarray(jnp.stack([o[:1, 0] for o in outs]).sum())
            batch()
            best = np.inf
            for _ in range(2):
                t0 = time.time()
                batch()
                best = min(best, (time.time() - t0) / frames)
            band_ms.append(best * 1e3)
        crit = max(band_ms)
        if nd == 1:
            t1 = crit
        eff = t1 / (nd * crit)
        print(f"nd={nd}: bands {[round(b,1) for b in band_ms]} ms, "
              f"critical {crit:.1f} ms -> slice {1e3/crit:.1f} FPS, "
              f"efficiency {eff:.2f}", flush=True)


if __name__ == "__main__":
    main()
