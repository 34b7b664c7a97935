"""Particle tracer: RK4 advection through a 3-channel velocity field.

The reference abuses the raygen launch to advance one particle per pixel
thread (computeTraces, exabrick.cu:1531-1574).  TPU-native form: the RK4
step is a vmapped batch update over all seeds — one jit call per
timestep, no pixel coupling.

Lifecycle parity (exa/OptixRenderer.cpp:450-487):
  * seeds reproduce the reference's stream bit-for-bit: libstdc++
    ``std::default_random_engine(0)`` (minstd_rand0, seed 0 -> state 1)
    through ``std::uniform_real_distribution<float>``, with GCC's
    right-to-left constructor-argument evaluation of
    ``vec3f(x(engine),y(engine),z(engine))`` (z draws first) —
    golden-tested against a g++-compiled oracle in tests/test_tracer_seed.py
  * one RK4 step per frame with step length ``steplen``; a particle dies
    (position := 2e10 sentinel) when any sub-sample is invalid, it leaves
    the bounds, or it moved less than 1e-10
  * live segments are rendered as rounded cones of radius 2 up to the
    current timestep (exabrick.cu:519-570)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import TRACE_DEAD
from .dvr import locate_leaf, sample_basis
from .surfaces import SurfaceData


def morton_order(points: np.ndarray) -> np.ndarray:
    """Permutation sorting (N, 3) points along a 3D Z-curve (10 bits per
    axis over the point AABB).  Used to emit the tracer's segment table
    in spatially-coherent seed order so the tiled streamline tracer's
    chunk bounding spheres stay tight (render/surfaces.py) — a pure
    reordering, render semantics (nearest hit over the set) unchanged."""
    pts = np.asarray(points, np.float64)
    lo = pts.min(0)
    ext = np.maximum(pts.max(0) - lo, 1e-30)
    q = np.minimum((pts - lo) / ext * 1023.0, 1023.0).astype(np.uint64)

    def _spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = _spread(q[:, 0]) | (_spread(q[:, 1]) << np.uint64(1)) \
        | (_spread(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


def minstd0_uniform_f32(n: int, seed: int = 0) -> np.ndarray:
    """n float32 draws of libstdc++'s
    ``uniform_real_distribution<float>(0,1)(default_random_engine(seed))``.

    minstd_rand0: x' = 16807*x mod (2^31-1); seed 0 maps to state 1.
    generate_canonical<float> uses one engine call: (x - 1) / R with
    R = float(2^31 - 2) which rounds to 2^31, all in float32 arithmetic.
    """
    m = 2147483647
    x = seed % m
    if x == 0:
        x = 1
    out = np.empty(n, np.uint32)
    for i in range(n):
        x = (16807 * x) % m
        out[i] = x
    return ((out - 1).astype(np.float32)
            / np.float32(2147483648.0)).astype(np.float32)


def seed_traces(
    num_traces: int,
    bounds_lo,
    bounds_hi,
    seed_region_lo=(0.0, 0.0, 0.0),
    seed_region_hi=(1.0, 1.0, 1.0),
    seed: int = 0,
) -> np.ndarray:
    """(N, 3) seeds exactly matching resetTracer
    (exa/OptixRenderer.cpp:450-462): per-axis
    ``uniform_real_distribution<float>(region_lo*size, region_hi*size)``
    — relative to the bounds *size* only, like the reference (which
    assumes voxel bounds start at 0) — drawn z, then y, then x per point
    (GCC evaluates the vec3f ctor arguments right to left)."""
    size = (
        np.asarray(bounds_hi, np.float32) - np.asarray(bounds_lo, np.float32)
    )
    a = (np.asarray(seed_region_lo, np.float32) * size).astype(np.float32)
    b = (np.asarray(seed_region_hi, np.float32) * size).astype(np.float32)
    u = minstd0_uniform_f32(3 * num_traces, seed).reshape(num_traces, 3)
    u = u[:, ::-1]  # draw order z, y, x -> columns x, y, z
    return (u * (b - a) + a).astype(np.float32)


def _sample_velocity(scene, pos, channels: Tuple[int, int, int]):
    """(ok, velocity (N,3)) at voxel-space positions (sampleDirection,
    exabrick.cu:945-963)."""
    node = locate_leaf(scene, pos)
    rid = scene.tree_leaf[node]
    rids = jnp.clip(rid, 0, None)
    oks = rid >= 0
    comps = []
    for c in channels:
        ok_c, v = sample_basis(scene, rids, pos, c)
        oks = oks & ok_c
        comps.append(v)
    return oks, jnp.stack(comps, axis=-1)


def rk4_step(scene, pos, steplen, channels: Tuple[int, int, int],
             bounds_lo, bounds_hi):
    """One RK4 advection step for a batch of particles (N, 3) in voxel
    space.  Dead particles stay dead; invalid steps die (exabrick.cu:1545-1572)."""
    alive = jnp.abs(pos).max(axis=-1) < TRACE_DEAD / 2

    ok1, k1 = _sample_velocity(scene, pos, channels)
    k1 = k1 * steplen
    ok2, k2 = _sample_velocity(scene, pos + 0.5 * k1, channels)
    k2 = k2 * steplen
    ok3, k3 = _sample_velocity(scene, pos + 0.5 * k2, channels)
    k3 = k3 * steplen
    ok4, k4 = _sample_velocity(scene, pos + k3, channels)
    k4 = k4 * steplen

    new = pos + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0
    valid = ok1 & ok2 & ok3 & ok4
    inside = ((new >= bounds_lo) & (new <= bounds_hi)).all(axis=-1)
    moved = jnp.linalg.norm(new - pos, axis=-1) >= 1e-10
    live = alive & valid & inside & moved
    return jnp.where(live[:, None], new, TRACE_DEAD)


class Tracer:
    """Host-side trace table + advance loop (OptixRenderer tracer state)."""

    def __init__(
        self,
        scene,
        num_traces: int = 1000,
        num_timesteps: int = 100,
        steplen: float = 1.0,
        channels: Tuple[int, int, int] = (0, 0, 0),
        seed_region_lo=(0.0, 0.0, 0.0),
        seed_region_hi=(1.0, 1.0, 1.0),
        radius: float = 2.0,
    ):
        self.scene = scene
        self.num_traces = num_traces
        self.num_timesteps = num_timesteps
        self.steplen = steplen
        self.channels = tuple(int(c) for c in channels)
        self.radius = radius
        self.seed_region = (seed_region_lo, seed_region_hi)
        self._step = jax.jit(
            lambda s, p: rk4_step(
                s, p, self.steplen, self.channels,
                s.voxel_bounds_lo, s.voxel_bounds_hi,
            )
        )
        self.reset()

    def reset(self):
        lo = np.asarray(self.scene.voxel_bounds_lo)
        hi = np.asarray(self.scene.voxel_bounds_hi)
        self.traces = np.full(
            (self.num_traces, self.num_timesteps, 3), TRACE_DEAD, np.float32
        )
        self.traces[:, 0] = seed_traces(
            self.num_traces, lo, hi, *self.seed_region
        )
        self.timestep = 0

    def advance(self) -> bool:
        """Advance one timestep (advanceTracer, OptixRenderer.cpp:476-487)."""
        if self.timestep + 1 >= self.num_timesteps:
            return False
        t = self.timestep
        nxt = np.asarray(
            self._step(self.scene, jnp.asarray(self.traces[:, t]))
        )
        self.traces[:, t + 1] = nxt
        self.timestep += 1
        return True

    def _seed_order(self) -> np.ndarray:
        """Morton order of the seed points (spatially-coherent segment
        emission for the tiled tracer's chunk culling)."""
        return morton_order(self.traces[:, 0])

    def surface_data(self) -> SurfaceData:
        """Segments up to the current timestep as renderable rounded cones."""
        t = self.timestep
        if t == 0:
            return SurfaceData.empty()
        tr = self.traces[self._seed_order()]
        a = tr[:, :t].reshape(-1, 3)
        b = tr[:, 1 : t + 1].reshape(-1, 3)
        seg_t = np.tile(np.arange(1, t + 1, dtype=np.int32),
                        (self.num_traces, 1)).reshape(-1)
        z = np.zeros((0, 3), np.float32)
        return SurfaceData(
            tri_v0=z, tri_e1=z, tri_e2=z, tri_n=z,
            seg_a=a.astype(np.float32),
            seg_b=b.astype(np.float32),
            seg_t=seg_t,
            seg_radius=np.float32(self.radius),
        )

    def surface_data_full(self) -> SurfaceData:
        """ALL timesteps as a fixed-shape segment table for the live
        viewer: not-yet-advanced segments carry TRACE_DEAD endpoints
        (discarded by trace_streamlines' dead mask) and display is
        culled by FrameState.tracer_timestep — the shape never changes
        across timesteps, so the jitted render never recompiles while
        particles advect (the reference instead rebuilds the streamline
        BVH per frame, exa/OptixRenderer.cpp:476-487)."""
        nt = self.num_timesteps
        tr = self.traces[self._seed_order()]
        a = tr[:, : nt - 1].reshape(-1, 3)
        b = tr[:, 1:nt].reshape(-1, 3)
        seg_t = np.tile(np.arange(1, nt, dtype=np.int32),
                        (self.num_traces, 1)).reshape(-1)
        z = np.zeros((0, 3), np.float32)
        return SurfaceData(
            tri_v0=z, tri_e1=z, tri_e2=z, tri_n=z,
            seg_a=a.astype(np.float32),
            seg_b=b.astype(np.float32),
            seg_t=seg_t,
            seg_radius=np.float32(self.radius),
        )
