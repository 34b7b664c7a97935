#!/usr/bin/env python
"""Op-level profile of the moving-camera (orbit) frame: where do the
~12 ms of in-graph camera products go?  Traces a few orbit frames with
jax.profiler and aggregates device-op durations from the perfetto JSON
by op category (einsum/dot, gather/take, pad/copy/convert, pallas
kernel, other).

Usage: python benchmarks/profile_products.py [volume] [frames]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from owlexabrick_tpu.bench_scene import slab_scene_grids
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.slabs import SlabConfig, render_slabs_camera
    from owlexabrick_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 5
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
                     extent_z=extent, adaptive_stride=True)

    def frame():
        return render_slabs_camera(grids, fs, cfg, cam, width, height)

    np.asarray(frame()[:4])  # compile
    log_dir = "/tmp/jax_prof_products"
    os.system(f"rm -rf {log_dir}")
    with jax.profiler.trace(log_dir):
        outs = [frame() for _ in range(frames)]
        np.asarray(jnp.stack([o[:1, 0] for o in outs]).sum())

    files = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found", file=sys.stderr)
        return 1
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)

    # device-lane complete events only (ph == "X" with dur), keyed by name
    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    pid_names = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower() or "XLA" in nm}
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e["dur"] / 1e3  # us -> ms
        by_name[name] += dur
        low = name.lower()
        if "custom-call" in low or "sweep" in low or "mosaic" in low:
            cat = "pallas-kernel"
        elif "dot" in low or "einsum" in low or "convolution" in low:
            cat = "dot/einsum"
        elif "gather" in low or "take" in low or "dynamic-slice" in low:
            cat = "gather/slice"
        elif ("copy" in low or "pad" in low or "convert" in low
              or "transpose" in low or "reshape" in low
              or "concatenate" in low):
            cat = "copy/pad/convert"
        elif "fusion" in low:
            cat = "fusion(other)"
        else:
            cat = "other"
        by_cat[cat] += dur

    print(f"# {frames} frames; totals are summed device-op ms across all")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:>18}: {ms:8.1f} ms total, {ms/frames:7.2f} ms/frame")
    print("# top 25 ops:")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms/frames:8.2f} ms/frame  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
