#!/usr/bin/env python
"""Headline benchmark: 1080p DVR of the synthetic multi-level AMR volume,
50-frame average with progressive accumulation (the reference's protocol,
exa/viewer.cpp:297-339).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The driver's north star (BASELINE.md): >= 30 FPS at 1080p DVR.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from owlexabrick_tpu.bench_scene import build_bench_scene
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.dvr import (
        RenderConfig,
        accumulate,
        composite_background,
        pack_rgba8,
        trace_dvr,
    )
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.scene import to_device

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 50))
    n = int(os.environ.get("BENCH_VOLUME", 64))
    tiles = int(os.environ.get("BENCH_TILES", 4))

    t0 = time.time()
    scene, stats = build_bench_scene(n)
    build_s = time.time() - t0
    print(f"# scene: {stats} ({build_s:.1f}s build)", file=sys.stderr)

    cam = Camera.look_at(
        from_=[n * 1.7, n * 1.4, n * 1.9],
        at=[n / 2, n / 2, n / 2],
        up=[0, 1, 0],
        fovy_degrees=45.0,
        width=width,
        height=height,
    )
    fs = make_frame_state(
        cam, 1, [[0.0, stats["value_max"]]], dt=1.0, opacity_scale=0.7
    )
    cfg = RenderConfig(num_channels=1)
    dscene = to_device(scene)
    fs = jax.tree.map(jnp.asarray, fs)

    p = width * height
    rows_per_tile = height // tiles

    @jax.jit
    def frame_tile(scene, fs, o, d, offset, accum):
        rgba = trace_dvr(scene, fs, cfg, o, d, offset)
        color = composite_background(rgba, jnp.zeros(3))
        new_accum, shown = accumulate(color, accum, fs.frame_id)
        return new_accum, pack_rgba8(shown)

    o_all, d_all = cam.rays(width, height)
    tile_od = []
    for t in range(tiles):
        sl = slice(t * rows_per_tile * width, (t + 1) * rows_per_tile * width)
        tile_od.append((jnp.asarray(o_all[sl]), jnp.asarray(d_all[sl])))
    accums = [jnp.zeros((rows_per_tile * width, 4), jnp.float32)
              for _ in range(tiles)]
    key = jax.random.PRNGKey(1)

    import dataclasses

    def render_frame(frame_id):
        nonlocal accums
        fsf = dataclasses.replace(fs, frame_id=jnp.int32(frame_id))
        imgs = []
        for t in range(tiles):
            k = jax.random.fold_in(jax.random.fold_in(key, frame_id), t)
            offset = jax.random.uniform(k, (tile_od[t][0].shape[0],))
            accums[t], img = frame_tile(
                dscene, fsf, tile_od[t][0], tile_od[t][1], offset, accums[t]
            )
            imgs.append(img)
        return imgs

    # warm-up (compile)
    t0 = time.time()
    imgs = render_frame(0)
    jax.block_until_ready(imgs)
    print(f"# compile+first frame: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for f in range(1, frames + 1):
        imgs = render_frame(f)
    jax.block_until_ready(imgs)
    dt_total = time.time() - t0

    fps = frames / dt_total
    mray_s = frames * p / dt_total / 1e6
    print(
        f"# {fps:.2f} FPS ({1000/fps:.1f} ms/frame), {mray_s:.1f} Mray/s "
        f"at {width}x{height} on {jax.devices()[0].platform}",
        file=sys.stderr,
    )

    # dump the final frame for eyeballing (bench_screenshot, viewer.cpp:297-339)
    try:
        from owlexabrick_tpu.utils.png import write_png

        img = np.concatenate([np.asarray(i) for i in imgs])
        rgba = img.view(np.uint8).reshape(height, width, 4)[::-1]
        write_png("bench_screenshot.png", rgba)
    except Exception as e:  # pragma: no cover
        print(f"# screenshot failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "dvr_fps_1080p_synthetic64",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
