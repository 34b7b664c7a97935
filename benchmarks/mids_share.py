#!/usr/bin/env python
"""Measure what fraction of a sweep frame is camera-only work (the
z/x-resample mids + tent builds) vs the Pallas kernel: times the full
frame against a mids-only jit at the bench camera.  Usage:
    python benchmarks/mids_share.py [volume=64] [frames=20]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from owlexabrick_tpu.bench_scene import slab_scene_grids
    from owlexabrick_tpu.render.camera import Camera
    from owlexabrick_tpu.render.frame import make_frame_state
    from owlexabrick_tpu.render.slabs import (
        SlabConfig,
        render_slabs_camera,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    w, h = 1920, 1080

    grids_host, meta = slab_scene_grids("blobs", n)
    grids = jax.tree.map(jnp.asarray, grids_host)
    cam = Camera.look_at([n / 2, n / 2, n * 2.2], [n / 2, n / 2, n / 2],
                         [0, 1, 0], 45.0, w, h)
    fs = make_frame_state(cam, 1, [[0.0, meta["value_max"]]], dt=1.0,
                          opacity_scale=0.7)
    extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
    cfg = SlabConfig(num_channels=1, nslabs=int(np.ceil(extent)),
                     chunk=12, extent_z=extent, adaptive_stride=True)

    def timed(f, label):
        r = f()
        np.asarray(jax.tree.leaves(r)[0].ravel()[:1])  # warm
        t0 = time.time()
        outs = [f() for _ in range(frames)]
        np.asarray(jnp.stack(
            [jax.tree.leaves(o)[0].ravel()[:1] for o in outs]).sum())
        dt = (time.time() - t0) / frames
        print(f"{label}: {dt*1e3:.1f} ms/frame")
        return dt

    t_full = timed(
        lambda: render_slabs_camera(grids, fs, cfg, cam, w, h), "full")

    # mids-only: rebuild the camera products exactly as render_slabs's
    # megakernel lane does, all chunks
    from owlexabrick_tpu.render import slabs as S

    @jax.jit
    def mids_only():
        f32 = jnp.float32
        i = jnp.arange(w, dtype=f32) + 0.5
        j = jnp.arange(h, dtype=f32) + 0.5
        from owlexabrick_tpu.render.slabs import permute_camera

        pos, dir00, du, dv = permute_camera(cam, grids.axis)
        rx = dir00[2] + i * du[2]
        ry = dir00[1] + j * dv[1]
        rz = dir00[0]
        z_lo = grids.bounds_lo[0]
        dz = extent / cfg.nslabs
        order = jnp.arange(cfg.nslabs, dtype=f32)
        z_planes = z_lo + (order + 0.5) * dz
        oz, oy, ox = pos[0], pos[1], pos[2]
        acc = 0.0
        for ci in range(cfg.nslabs // cfg.chunk):
            z_s = z_planes[ci * cfg.chunk:(ci + 1) * cfg.chunk]
            scale = (z_s - oz) / rz
            x_pos = ox + scale[:, None] * rx[None, :]
            for li, L in enumerate(grids.levels):
                cw = float(1 << L)
                m = grids.masks[li]
                org = grids.origins[li]
                nz, ny, nx = m.shape
                qz = z_s / cw - org[0] - 0.5
                k = jnp.arange(nz, dtype=f32)
                wz = jnp.maximum(0.0, 1.0 - jnp.abs(qz[:, None] - k))
                qx = x_pos / cw - org[2] - 0.5
                kx = jnp.arange(nx, dtype=f32)
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(qx[..., None] - kx))
                for vol in (grids.vals[li][0], m):
                    sv = jnp.einsum("sz,zyx->syx", wz, vol,
                                    preferred_element_type=f32,
                                    precision=jax.lax.Precision.HIGH)
                    mid = jnp.einsum("syx,swx->syw", sv, wx,
                                     preferred_element_type=f32,
                                     precision=jax.lax.Precision.HIGH)
                    acc = acc + mid.sum()
        return acc

    t_mids = timed(mids_only, "mids-only (unwindowed)")
    print(f"mids share (upper bound, unwindowed): "
          f"{100 * t_mids / t_full:.0f}%")


if __name__ == "__main__":
    main()
