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


# ----------------------------------------------------------------------------
# scene sharding: z-bands across devices (datasets beyond one chip's HBM)
# ----------------------------------------------------------------------------

def make_band_mesh(n_bands: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_bands > len(devices):
        raise ValueError(f"{n_bands} bands need {n_bands} devices")
    return Mesh(np.asarray(devices[:n_bands]), ("z",))


def build_band_grids(bricks, scalars, n_bands: int, nslabs: int,
                     axis: int = 2):
    """Partition the sweep axis into ``n_bands`` equal z-bands on the
    global slab lattice (the same partitioning as render_slabs_banded)
    and build per-band level grids, padded to common shapes and stacked
    with a leading band axis so they can be device-sharded.

    Returns (stacked, meta): ``stacked`` is a dict of band-major arrays
    (vals/masks/origins per level, bounds, zranges); ``meta`` carries the
    static fields (levels, ns_band, extent per band, flip hint)."""
    import dataclasses as _dc

    from ..render.slabs import (
        LevelGrids,
        _compute_zranges,
        build_level_grids,
    )
    from ..core.types import Bricks

    scalars = np.asarray(scalars, np.float32)
    if scalars.ndim == 1:
        scalars = scalars[None]
    lo3, hi3 = bricks.bounds()
    coarsest = 1 << int(np.max(bricks.level))
    pad = 0.5 * coarsest
    z_lo = float(lo3[:, axis].min()) - pad
    z_hi = float(hi3[:, axis].max()) + pad
    ns_band = -(-nslabs // n_bands)
    dz = (z_hi - z_lo) / (ns_band * n_bands)

    cw_b = (1 << bricks.level).astype(np.float64)
    b_lo = lo3[:, axis] - 0.5 * cw_b
    b_hi = hi3[:, axis] + 0.5 * cw_b

    levels_all = tuple(sorted(int(l) for l in np.unique(bricks.level)))
    per_band = []
    for b in range(n_bands):
        zb0 = z_lo + b * ns_band * dz
        zb1 = zb0 + ns_band * dz
        sel = np.nonzero((b_hi > zb0) & (b_lo < zb1))[0]
        if sel.size == 0:
            per_band.append(None)
            continue
        sub = Bricks(
            lower=bricks.lower[sel], size=bricks.size[sel],
            level=bricks.level[sel], begin=bricks.begin[sel],
        )
        gb = build_level_grids(sub, scalars, axis=axis)
        lo_p = np.asarray(gb.bounds_lo).copy()
        hi_p = np.asarray(gb.bounds_hi).copy()
        lo_p[0], hi_p[0] = zb0, zb1
        zr = _compute_zranges(
            list(gb.levels), [np.asarray(v) for v in gb.vals],
            [np.asarray(m) for m in gb.masks],
            [np.asarray(o) for o in gb.origins], lo_p, hi_p,
        )
        gb = _dc.replace(
            gb, bounds_lo=jnp.asarray(lo_p), bounds_hi=jnp.asarray(hi_p),
            zranges=jnp.asarray(zr),
        )
        per_band.append(gb)

    # common padded dims per global level
    dims = {}
    nzf_max = 1
    c = scalars.shape[0]
    for gb in per_band:
        if gb is None:
            continue
        nzf_max = max(nzf_max, gb.zranges.shape[0])
        for L, v in zip(gb.levels, gb.vals):
            d3 = tuple(int(s) for s in v.shape[1:])
            prev = dims.get(L, (1, 1, 1))
            dims[L] = tuple(max(a, b) for a, b in zip(prev, d3))
    for L in levels_all:
        dims.setdefault(L, (1, 1, 1))

    def pad_to(a, shape):
        out = np.zeros(shape, np.float32)
        sl = tuple(slice(0, s) for s in a.shape)
        out[sl] = a
        return out

    stacked = {"vals": [], "masks": [], "origins": [], "zranges": [],
               "bounds_lo": [], "bounds_hi": []}
    for L in levels_all:
        nz, ny, nx = dims[L]
        vs, ms, os_ = [], [], []
        for gb in per_band:
            if gb is not None and L in gb.levels:
                li = gb.levels.index(L)
                vs.append(pad_to(np.asarray(gb.vals[li]), (c, nz, ny, nx)))
                ms.append(pad_to(np.asarray(gb.masks[li]), (nz, ny, nx)))
                os_.append(np.asarray(gb.origins[li]))
            else:
                vs.append(np.zeros((c, nz, ny, nx), np.float32))
                ms.append(np.zeros((nz, ny, nx), np.float32))
                os_.append(np.zeros(3, np.float32))
        stacked["vals"].append(jnp.asarray(np.stack(vs)))
        stacked["masks"].append(jnp.asarray(np.stack(ms)))
        stacked["origins"].append(jnp.asarray(np.stack(os_)))
    for b, gb in enumerate(per_band):
        zb0 = z_lo + b * ns_band * dz
        zb1 = zb0 + ns_band * dz
        if gb is None:
            zr = np.stack([np.full(nzf_max, np.inf, np.float32),
                           np.full(nzf_max, -np.inf, np.float32)], axis=1)
            blo = np.asarray([zb0, 0.0, 0.0], np.float32)
            bhi = np.asarray([zb1, 1.0, 1.0], np.float32)
        else:
            zr = np.asarray(gb.zranges)
            padn = nzf_max - zr.shape[0]
            if padn:
                zr = np.concatenate(
                    [zr, np.stack([np.full(padn, np.inf, np.float32),
                                   np.full(padn, -np.inf, np.float32)],
                                  axis=1)]
                )
            blo = np.asarray(gb.bounds_lo)
            bhi = np.asarray(gb.bounds_hi)
        stacked["zranges"].append(jnp.asarray(zr))
        stacked["bounds_lo"].append(jnp.asarray(blo))
        stacked["bounds_hi"].append(jnp.asarray(bhi))
    stacked["zranges"] = jnp.stack(stacked["zranges"])
    stacked["bounds_lo"] = jnp.stack(stacked["bounds_lo"])
    stacked["bounds_hi"] = jnp.stack(stacked["bounds_hi"])

    meta = {
        "levels": levels_all,
        "ns_band": ns_band,
        "extent_band": float(ns_band * dz),
        "num_channels": c,
        "axis": axis,
    }
    return stacked, meta


def make_band_sharded_slab_renderer(mesh: Mesh, cfg, meta,
                                    width: int, height: int):
    """Scene-sharded rendering: each device along the ``"z"`` mesh axis
    holds only its z-band's level grids (the device-resident analog of
    render_slabs_banded) and sweeps its band for ALL pixels; partial
    (color, alpha) images are combined front-to-back with a
    ppermute-doubling parallel-prefix of the 'over' operator — log2(D)
    ICI steps, no host round trips.

    Returns f(stacked, fs, pos, dir00, du, dv) -> (H*W, 4) rgba (on the
    back-most device's prefix, gathered by indexing the stacked output).
    Camera vectors must be permuted to the grid frame and separable."""
    import dataclasses as _dc

    from ..render.slabs import LevelGrids, render_slabs
    from ..core.constants import TERMINATION_THRESHOLD

    n_bands = mesh.shape["z"]
    bcfg_base = cfg

    def body(stacked, fs, pos, dir00, du, dv):
        g = LevelGrids(
            vals=tuple(v[0] for v in stacked["vals"]),
            masks=tuple(m[0] for m in stacked["masks"]),
            origins=tuple(o[0] for o in stacked["origins"]),
            zranges=stacked["zranges"][0],
            bounds_lo=stacked["bounds_lo"][0],
            bounds_hi=stacked["bounds_hi"][0],
            vrange_zy=(),
            levels=meta["levels"],
            num_channels=meta["num_channels"],
            axis=meta["axis"],
            y_bin=(),
        )
        flip = bool(bcfg_base.flip)
        bcfg = _dc.replace(
            bcfg_base, nslabs=meta["ns_band"], saturate_collapse=False,
            extent_z=meta["extent_band"],
        )
        rgba = render_slabs(
            g, fs, bcfg, pos, dir00, du, dv, width, height
        )
        color = rgba[:, :3]
        alpha = rgba[:, 3]

        # parallel-prefix 'over' along ascending front-to-back band order
        # (band 0 is nearest when not flipped); unpaired ppermute receives
        # zeros = the identity of 'over'
        k = 1
        while k < n_bands:
            if not flip:
                perm = [(i, i + k) for i in range(n_bands - k)]
            else:
                perm = [(i, i - k) for i in range(k, n_bands)]
            rc = jax.lax.ppermute(color, "z", perm)
            ra = jax.lax.ppermute(alpha, "z", perm)
            # received prefix is IN FRONT of ours
            color = rc + (1.0 - ra)[:, None] * color
            alpha = ra + (1.0 - ra) * alpha
            k *= 2

        # the reference's saturated-pixel collapse, applied once globally
        sat = alpha >= TERMINATION_THRESHOLD
        color = jnp.where(sat[:, None], color * alpha[:, None], color)
        alpha = jnp.where(sat, 1.0, alpha)
        return jnp.concatenate([color, alpha[:, None]], axis=1)[None]

    def fn(stacked, fs, pos, dir00, du, dv):
        out = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("z"), P(), P(), P(), P(), P()),
            out_specs=P("z"),
            check_vma=False,
        )(stacked, fs, pos, dir00, du, dv)
        # the back-most band in traversal order holds the full composite
        back = (n_bands - 1) if not bcfg_base.flip else 0
        return out[back]

    return jax.jit(fn)


def shard_bands(mesh: Mesh, stacked):
    """Place stacked band grids with each band on its own device."""
    sh = NamedSharding(mesh, P("z"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)


def shard_rays(mesh: Mesh, o: np.ndarray, d: np.ndarray):
    """Place ray arrays sharded along the pixel axis."""
    sh = NamedSharding(mesh, P("px"))
    return jax.device_put(o, sh), jax.device_put(d, sh)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)
