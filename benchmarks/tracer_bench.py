#!/usr/bin/env python
"""Interleaved dense-vs-tiled streamline tracing benchmark.

Production-shaped segment table (seeds x timesteps, Morton seed order
like render/tracer.py emits) against a perspective ray grid, timed
interleaved (contention-robust best-of) on whatever device JAX picks
(TPU under the default env; pass --cpu to force CPU).

Usage: python benchmarks/tracer_bench.py [seeds] [steps] [W] [H] [rounds]
           [--cpu] [--region f] [--tris]
  --region f: seeds confined to a sub-box of fractional size f per axis
              (the reference tracer's seed-region UX; localized seeds
              are the best case for tile culling).
  --tris: benchmark the tiled TRIANGLE path instead, on a bumpy-sphere
          mesh of ~2*seeds*steps triangles (same dense-vs-tiled A/B).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from owlexabrick_tpu.render.surfaces import (
        SurfaceData,
        trace_streamlines,
        trace_streamlines_tiled,
        trace_triangles,
        trace_triangles_tiled,
    )
    from owlexabrick_tpu.render.tracer import morton_order

    n_seeds = int(args[0]) if len(args) > 0 else 1000
    n_steps = int(args[1]) if len(args) > 1 else 100
    w = int(args[2]) if len(args) > 2 else 512
    h = int(args[3]) if len(args) > 3 else 384
    rounds = int(args[4]) if len(args) > 4 else 3
    tris_mode = "--tris" in sys.argv
    region = 1.0
    if "--region" in sys.argv:
        region = float(sys.argv[sys.argv.index("--region") + 1])

    rng = np.random.default_rng(0)
    if tris_mode:
        from owlexabrick_tpu.core.types import TriangleMesh

        nuv = max(16, int(np.sqrt(n_seeds * n_steps)))
        u = np.linspace(0, 2 * np.pi, nuv, endpoint=False)
        v = np.linspace(1e-3, np.pi - 1e-3, nuv)
        uu, vv = np.meshgrid(u, v, indexing="ij")
        r = 14.0 + 2.0 * np.sin(3 * uu) * np.sin(4 * vv)
        verts = np.stack([
            r * np.sin(vv) * np.cos(uu),
            r * np.cos(vv),
            r * np.sin(vv) * np.sin(uu),
        ], -1).reshape(-1, 3).astype(np.float32)
        idx = []
        for ii in range(nuv):
            for jj in range(nuv - 1):
                a = ii * nuv + jj
                b = ((ii + 1) % nuv) * nuv + jj
                idx.append([a, b, a + 1])
                idx.append([b, b + 1, a + 1])
        surf = SurfaceData.from_meshes([TriangleMesh(
            vertices=verts, indices=np.asarray(idx, np.int32)
        )])
    else:
        half = 25.0 * region
        pos = rng.uniform(-half, half, (n_seeds, 3)).astype(np.float32)
        vel = 0.25 * rng.normal(0, 1, (n_seeds, 3)).astype(np.float32)
        pts = [pos.copy()]
        for _ in range(n_steps):
            vel += 0.08 * rng.normal(0, 1, (n_seeds, 3)).astype(np.float32)
            vel *= 0.9
            pos = pos + vel
            pts.append(pos.copy())
        traj = np.stack(pts, axis=1)[morton_order(np.stack(pts, 1)[:, 0])]
        z = np.zeros((0, 3), np.float32)
        surf = SurfaceData(
            tri_v0=z, tri_e1=z, tri_e2=z, tri_n=z,
            seg_a=traj[:, :-1].reshape(-1, 3),
            seg_b=traj[:, 1:].reshape(-1, 3),
            seg_t=np.tile(np.arange(1, n_steps + 1, dtype=np.int32),
                          (n_seeds, 1)).reshape(-1),
            seg_radius=np.float32(1.5),
        )

    o0 = np.array([70.0, 45.0, 80.0], np.float32)
    fwd = -o0 / np.linalg.norm(o0)
    up = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    vup = np.cross(right, fwd)
    i = (np.arange(w) + 0.5) / w - 0.5
    j = (np.arange(h) + 0.5) / h - 0.5
    d = (fwd[None, None]
         + 0.9 * i[None, :, None] * right[None, None]
         + 0.7 * j[:, None, None] * vup[None, None]).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(o0, d.shape).copy()
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    p = o.shape[0]
    tmin = jnp.full(p, 1e-6, jnp.float32)
    tmax = jnp.full(p, 2e10, jnp.float32)
    ts = jnp.int32(1 << 30)
    surf = jax.tree.map(jnp.asarray, surf)
    n_prims = surf.num_tris if tris_mode else surf.num_segments
    print(f"# device={jax.devices()[0].platform} P={p} "
          f"prims={n_prims} mode={'tris' if tris_mode else 'segments'} "
          f"region={region}", flush=True)

    if tris_mode:
        fd = jax.jit(lambda o, d: trace_triangles(surf, o, d, tmin, tmax))
        ft = jax.jit(lambda o, d: trace_triangles_tiled(
            surf, o, d, tmin, tmax, screen=(w, h)))
    else:
        fd = jax.jit(
            lambda o, d: trace_streamlines(surf, ts, o, d, tmin, tmax)
        )
        ft = jax.jit(lambda o, d: trace_streamlines_tiled(
            surf, ts, o, d, tmin, tmax, screen=(w, h)))

    rd = fd(o, d)
    np.asarray(rd[0])
    rt = ft(o, d)
    np.asarray(rt[0])
    eq = np.allclose(np.asarray(rt[0]), np.asarray(rd[0]),
                     rtol=1e-5, atol=1e-5, equal_nan=True)
    best = {"dense": 1e9, "tiled": 1e9}
    for _ in range(rounds):
        for name, f in (("dense", fd), ("tiled", ft)):
            t0 = time.perf_counter()
            np.asarray(f(o, d)[0])
            best[name] = min(best[name], time.perf_counter() - t0)
    print(f"dense {best['dense']*1e3:.1f} ms  tiled {best['tiled']*1e3:.1f} ms"
          f"  speedup {best['dense']/best['tiled']:.2f}x  equal={eq}",
          flush=True)


if __name__ == "__main__":
    main()
