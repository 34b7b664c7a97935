"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference scales by replicating buffers/BVHs per GPU and giving each
device its own pixels (OWL multi-device, SURVEY.md "Parallelism"); no
inter-GPU communication exists.  The TPU-native analog:

  * mesh axis ``"px"``  — pixels sharded, scene replicated.  Rays are
    embarrassingly parallel; shard_map runs the full wavefront kernel per
    device on its pixel tile.  The only collective is the implicit
    all-gather of the framebuffer when the host reads it.
  * mesh axis ``"spp"`` — samples-per-pixel: every device along this axis
    renders the same pixels with a different jitter/offset stream and the
    results are psum-averaged — progressive refinement converges
    spp-times faster per wall-clock frame.

Both axes ride ICI; there is no halo exchange because the scene is
replicated (datasets beyond one chip's HBM would add a scene-sharding
axis with ppermute ray forwarding — planned, not yet needed at the
reference's dataset sizes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.dvr import (
    RenderConfig,
    composite_background,
    trace_dvr,
)
from ..render.surfaces import trace_surface_pass


def make_mesh(n_px: int, n_spp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_px * n_spp > len(devices):
        raise ValueError(
            f"mesh {n_px}x{n_spp} needs {n_px*n_spp} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[: n_px * n_spp]).reshape(n_px, n_spp)
    return Mesh(dev, ("px", "spp"))


def _render_tile(scene, fs, surf, o, d, key, *, cfg):
    """Per-device body: full surface + volume pass on this pixel tile,
    with a jitter stream decorrelated along the spp axis, psum-averaged."""
    spp_idx = jax.lax.axis_index("spp")
    px_idx = jax.lax.axis_index("px")
    # rays differ along spp only through the RNG; mark them varying on both
    # mesh axes so loop carries type-check under shard_map
    o = jax.lax.pcast(o, ("spp",), to="varying")
    d = jax.lax.pcast(d, ("spp",), to="varying")
    k = jax.random.fold_in(jax.random.fold_in(key, spp_idx), px_idx)
    p = o.shape[0]
    offset = jax.random.uniform(jax.random.fold_in(k, 2), (p,))

    t_hit, bg = trace_surface_pass(
        scene, fs, surf, cfg, o, d, jax.random.fold_in(k, 3)
    )
    rgba = trace_dvr(scene, fs, cfg, o, d, offset, t_end_world=t_hit)
    color = composite_background(rgba, bg)
    n_spp = jax.lax.axis_size("spp")
    return jax.lax.psum(color, "spp") / n_spp


def make_sharded_renderer(mesh: Mesh, cfg: RenderConfig):
    """Build a jitted sharded render function.

    Returns f(scene, fs, surf, o, d, key) -> (P, 3) linear color, with
    o/d sharded along "px" and everything else replicated.
    """
    fn = jax.shard_map(
        partial(_render_tile, cfg=cfg),
        mesh=mesh,
        in_specs=(P(), P(), P(), P("px"), P("px"), P()),
        out_specs=P("px"),
    )
    return jax.jit(fn)


def make_sharded_slab_renderer(mesh: Mesh, cfg, width: int, height: int,
                               jitter: bool = True):
    """Pixel-band sharding for the slab fast path: each device along "px"
    sweeps the same slabs but resamples only its horizontal band of the
    image (the per-band rays stay separable: the band offset is a shift of
    dir00 along dv).  Devices along "spp" render decorrelated sub-pixel
    offsets, psum-averaged — progressive AA at line rate.

    Returns f(grids, fs, pos, dir00, du, dv, key[, knots]) -> (H*W, 4)
    rgba.  Pass ``knots`` from ``compress_pwl`` (computed on the host
    from the concrete LUT) so each device's kernel gets the compressed
    transfer-function classification too.
    """
    from ..render.slabs import render_slabs

    n_px = mesh.shape["px"]
    if height % n_px != 0:
        raise ValueError(f"height {height} not divisible by px={n_px}")
    rows = height // n_px

    def body(grids, fs, pos, dir00, du, dv, key, knots=None):
        band = jax.lax.axis_index("px")
        spp = jax.lax.axis_index("spp")
        if jitter:
            # sub-pixel jitter: a per-spp-device shift of the whole pixel
            # grid (keeps the sweep separable, unlike per-pixel jitter)
            k = jax.random.fold_in(key, spp)
            jx = jax.random.uniform(jax.random.fold_in(k, 0), ()) - 0.5
            jy = jax.random.uniform(jax.random.fold_in(k, 1), ()) - 0.5
        else:
            jx = jy = 0.0
        dir00_b = dir00 + (band * rows + jy) * dv + jx * du
        rgba = render_slabs(
            grids, fs, cfg, pos, dir00_b, du, dv, width, rows, knots=knots
        )
        n_spp = jax.lax.axis_size("spp")
        return jax.lax.psum(rgba, "spp") / n_spp

    def fn(grids, fs, pos, dir00, du, dv, key, knots=None):
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(),) * 7 + ((P(),) if knots is not None else ()),
            out_specs=P("px"),
            # pallas_call outputs don't carry vma annotations yet
            check_vma=False,
        )(grids, fs, pos, dir00, du, dv, key,
          *(() if knots is None else (knots,)))

    return jax.jit(fn, static_argnames=())


def shard_rays(mesh: Mesh, o: np.ndarray, d: np.ndarray):
    """Place ray arrays sharded along the pixel axis."""
    sh = NamedSharding(mesh, P("px"))
    return jax.device_put(o, sh), jax.device_put(d, sh)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)
