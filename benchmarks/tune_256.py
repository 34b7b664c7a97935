#!/usr/bin/env python
"""Interleaved A/B tuning harness for the 256^3 sweep megakernel.

Builds the bench scene once, then times SlabConfig variants interleaved
(contention-robust best-of) with the sustained-throughput protocol.
Usage: python benchmarks/tune_256.py [volume] [frames] [rounds] \
           [variant,variant,...] [scene]
scene: blobs (default) | exajet
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    from owlexabrick_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    from owlexabrick_tpu.bench_scene import slab_scene_grids
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.slabs import (
        SlabConfig,
        render_slabs_camera,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    scene_kind = sys.argv[5] if len(sys.argv) > 5 else "blobs"
    width, height = 1920, 1080

    t0 = time.time()
    grids_host, meta = slab_scene_grids(scene_kind, n)
    grids = jax.tree.map(jnp.asarray, grids_host)
    scal_max = meta["value_max"]
    print(f"# build/load {time.time()-t0:.0f}s, levels {grids.levels}",
          file=sys.stderr)

    cam = Camera.look_at(
        from_=[n / 2, n / 2, n * 2.2], at=[n / 2, n / 2, n / 2],
        up=[0, 1, 0], fovy_degrees=45.0, width=width, height=height,
    )
    fs = make_frame_state(
        cam, 1, [[0.0, float(scal_max)]], dt=1.0, opacity_scale=0.7
    )
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    # pin the pre-round-3 default precision so variant names keep their
    # historical meaning (the SlabConfig default moved to hi_lo)
    base = SlabConfig(
        num_channels=1, nslabs=int(np.ceil(extent / 1.0)), chunk=12,
        extent_z=extent, dot_precision="high",
    )

    variants = {
        "stride": dataclasses.replace(base, adaptive_stride=True),
        "stride_hi_lo": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo"),
        "stride_prec_default": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="default"),
        "stride_bf16": dataclasses.replace(
            base, adaptive_stride=True, bf16_interp=True),
        "stride_chunk7": dataclasses.replace(
            base, adaptive_stride=True, chunk=7),
        "stride_nocarry": dataclasses.replace(
            base, adaptive_stride=True, carry_termination=False),
        "stride_hi_lo_nocarry": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo",
            carry_termination=False),
        "stride_hi_lo_chunk8": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo", chunk=8),
        "stride_hi_lo_fit15": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo",
            xf_fit_quantum=1.5),
        "stride_hi_lo_fit20": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo",
            xf_fit_quantum=2.0),
        "stride_fit20": dataclasses.replace(
            base, adaptive_stride=True, xf_fit_quantum=2.0),
        "stride_nofuse": dataclasses.replace(
            base, adaptive_stride=True, fuse_mids=False),
        "stride_hi_lo_nofuse": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo",
            fuse_mids=False),
        # ablations: localize the remaining kernel cost
        "abl_knots8": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo",
            xf_knots=8),
        "abl_bf16": dataclasses.replace(
            base, adaptive_stride=True, bf16_interp=True),
        "abl_tr64": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo",
            tile_rows=64),
        "abl_tr216": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo",
            tile_rows=216),
        "abl_chunk16": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo",
            chunk=16),
        "abl_chunk24": dataclasses.replace(
            base, adaptive_stride=True, dot_precision="hi_lo",
            chunk=24),
    }
    if len(sys.argv) > 4:
        keep = sys.argv[4].split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    def run(cfg):
        outs = [
            render_slabs_camera(grids, fs, cfg, cam, width, height)
            for _ in range(frames)
        ]
        np.asarray(jnp.stack([o[:1, 0] for o in outs]).sum())

    best = {k: np.inf for k in variants}
    for k, cfg in variants.items():
        run(cfg)  # compile
    for r in range(rounds):
        for k, cfg in variants.items():
            t0 = time.time()
            run(cfg)
            dt = (time.time() - t0) / frames
            best[k] = min(best[k], dt)
            print(f"# round {r} {k}: {1.0/dt:.2f} FPS", file=sys.stderr)
    for k in variants:
        print(f"{k}: {1.0/best[k]:.2f} FPS ({best[k]*1e3:.1f} ms)")


if __name__ == "__main__":
    import jax.numpy as jnp  # noqa: F401
    main()
