#!/usr/bin/env python
"""Capture a device trace of orbit frames and print per-op time shares.

Parses the XSpace protobuf directly (tensorflow + tensorboard profile
plugin are in the image) and aggregates device-plane event durations by
HLO op category — the ground truth for where the per-frame camera
products (the orbit-vs-cached gap) actually go.

Usage: python benchmarks/profile_orbit.py [volume] [frames] [cached01] [kmid] [scene]
"""

import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate(logdir):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # layout moved across TF versions
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {logdir}"
    tot = defaultdict(float)
    cnt = defaultdict(int)
    line_tot = defaultdict(float)
    device_total = 0.0
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                lsum = sum(ev.duration_ps for ev in line.events) / 1e9
                line_tot[f"{plane.name} :: {line.name}"] += lsum
                if line.name != "XLA Ops":
                    continue  # leaf per-op line only (no nesting)
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e9  # ms
                    tot[name] += dur
                    cnt[name] += 1
                    device_total += dur
    return tot, cnt, device_total, line_tot


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
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cached = len(sys.argv) > 3 and sys.argv[3] == "1"
    # argv[4]: kernel-mids mode — "" (einsum path), "highest", "hi_lo"
    kmid = sys.argv[4] if len(sys.argv) > 4 else ""
    scene_kind = sys.argv[5] if len(sys.argv) > 5 else "blobs"
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
                     chunk=12, extent_z=extent, adaptive_stride=True,
                     camera_cache_max_mb=8192,
                     kernel_mids=bool(kmid),
                     kernel_mids_precision=(kmid or "highest"))

    cache = {} if cached else None

    def frame():
        return np.asarray(render_slabs_camera(
            grids, fs, cfg, cam, width, height,
            camera_cache=cache)[:1, 0])

    frame()  # compile + (maybe) fill cache
    frame()
    logdir = f"/tmp/jaxprof_{int(time.time())}"
    with jax.profiler.trace(logdir):
        for _ in range(frames):
            frame()
    tot, cnt, device_total, line_tot = aggregate(logdir)
    print("# plane/line totals (ms over all frames):")
    for k, v in sorted(line_tot.items(), key=lambda kv: -kv[1]):
        if v > 0.5:
            print(f"#   {v:10.1f} ms  {k}")
    print(f"# XLA-Ops total {device_total:.1f} ms over {frames} frames "
          f"({device_total/frames:.1f} ms/frame)")
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    for name, ms in rows[:48]:
        print(f"{ms/frames:8.2f} ms/frame  x{cnt[name]//frames:<5d} "
              f"{name[:150]}")
    # category rollup: fusions / dots(MXU) / pallas custom-calls / copies
    cats = defaultdict(float)
    for name, ms in tot.items():
        low = name.lower()
        if "custom-call" in low or "tpu_custom_call" in low:
            cats["pallas custom-call"] += ms
        elif low.startswith("%fusion") or "_fusion" in low:
            cats["fusion (VPU/mixed)"] += ms
        elif "convolution" in low or low.startswith("%dot"):
            cats["dot/conv (MXU)"] += ms
        elif "copy" in low or "slice" in low or "bitcast" in low:
            cats["copy/slice"] += ms
        elif "while" in low or "cond" in low or "branch" in low:
            cats["control"] += ms
        else:
            cats["other"] += ms
    print("# categories:")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"#   {v/frames:8.2f} ms/frame  {k}")


if __name__ == "__main__":
    main()
