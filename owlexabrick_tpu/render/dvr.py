"""TPU-native DVR core: stackless BSP traversal + masked wavefront marching.

Design (replaces the OptiX BVH + per-thread recursion of
programs/exabrick.cu with XLA-friendly structure):

  * Rays are processed as a flat (P,) batch; all control flow is
    `lax.while_loop`/`fori_loop` with per-ray active masks — static
    shapes, single compilation.
  * The next region along a ray is found by *point location* in the BSP
    recorded during region building: exactly `tree_depth` dependent
    gathers, identical iteration count for every ray (no stack, no
    divergence in trip count).  Holes and TF-culled regions are skipped by
    advancing to the leaf box's exit distance — the same space-skipping
    semantics as the reference's culled BVH (exabrick.cu:283-331) without
    any rebuild: the per-region active mask is recomputed on the fly from
    the current transfer function.
  * Basis-function sampling is fully vectorized: each sample gathers
    (K bricks x 8 corners) scalars in one gather op, where K is the
    static max-bricks-per-region (padded with -1).

Formula parity with the reference is kept bit-close (see oracle/) — same
opacity correction, same midpoint sampling, same termination threshold.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax.numpy as jnp
from jax import lax

from ..core.constants import (
    EMPTY_CELL_POISON_VALUE,
    REGION_ADVANCE_EPS,
    TERMINATION_THRESHOLD,
)
from .xf import active_for_volume_sampling, lookup_xf

_CORNERS = jnp.array(
    [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)], jnp.int32
)  # (8, 3)


@dataclass(frozen=True)
class RenderConfig:
    """Static (compile-time) render options.

    The reference keeps most of these as runtime launch params; here they
    are compile-time so XLA can strip dead passes entirely (a disabled
    feature costs nothing)."""

    num_channels: int = 1
    gradient_shading_dvr: bool = False
    gradient_shading_iso: bool = True
    space_skipping: bool = True
    max_region_iters: int = 512
    # surface passes
    iso_surfaces: bool = False
    ao_samples: int = 0
    # fast-path AO only: number of shared candidate directions per frame
    # in the shadow-volume estimator (render/ao_sweep.py).  Each pixel
    # picks one per sample with |cos|-proportional probability, so
    # pixels decorrelate within a frame and the importance weight
    # concentrates near 1 (the reference's per-pixel cosine draws,
    # exabrick.cu:1612-1645, are the D->inf limit).  Shadow-volume build
    # cost scales with this; per-pixel gather cost does not.
    ao_dirs: int = 4
    # secondary field used to colormap iso surfaces (LaunchParams.h:59-60)
    colormap_channel: int = 0
    # EXPLICIT_BASIS_METHOD parity: True = basis reconstruction over
    # same-bricks regions (default ON, exa/common.h:62-64); False =
    # nearest-cell sampling over per-brick leaves (build the scene with
    # basis_method=False)
    basis_method: bool = True
    # ANALYTIC_GRADIENTS parity (CMakeLists.txt:65-67, default ON): when
    # False, shading gradients use central differences (gradientCD,
    # exabrick.cu:832-880) with per-offset leaf relocation.  Non-basis
    # sampling always uses central differences (exabrick.cu:930-940).
    analytic_gradients: bool = True
    # ALLOW_EMPTY_CELLS parity (CMakeLists.txt:73, default OFF): cells
    # whose scalar equals EMPTY_CELL_POISON_VALUE are skipped in the
    # basis sum (notEmptyCell, exabrick.cu:614-618); pass the same flag
    # to build_level_grids for the slab fast path
    allow_empty_cells: bool = False
    # FAST_CENTRAL_DIFFERENCES parity (CMakeLists.txt:80-82, default OFF):
    # in CD mode, keep offset samples in the current region instead of
    # relocating (exabrick.cu:850-852)
    fast_central_differences: bool = False
    # fast path only: coarse-only slab tiles take wider z steps, like
    # the reference's per-region dt = global_dt * finestLevelCellWidth
    # (exabrick.cu:1129).  Off by default: unit stride oversamples
    # coarse regions (higher fidelity than the reference's marcher)
    # adaptive z-stride in the slab fast path: coarse-only tiles take
    # wider sweep steps, the slab form of the reference's per-region
    # dt = global_dt * finestLevelCellWidth (exabrick.cu:1129 — always
    # on there).  Default ON since the round-3 fidelity survey
    # (benchmarks/stride_survey.py)
    adaptive_stride: bool = True
    # wavefront frames: compact the ray queue to half size whenever at
    # least half the rays finished (bit-identical output; the lockstep
    # tail runs on geometrically shrinking batches — see
    # trace_dvr_packed_compacted)
    wavefront_compaction: bool = True


# ----------------------------------------------------------------------------
# BSP point location
# ----------------------------------------------------------------------------

def locate_leaf(scene, p):
    """Find the BSP leaf node containing each point. p: (P,3) -> (P,) node."""
    # derive from p so the carry keeps p's varying mesh axes under shard_map
    node0 = jnp.zeros_like(p[:, 0], dtype=jnp.int32)

    def body(_, node):
        axis = scene.tree_axis[node]
        split = scene.tree_split[node]
        child = scene.tree_child[node]
        is_inner = axis < 3
        ax = jnp.clip(axis, 0, 2)
        pax = jnp.take_along_axis(p, ax[:, None], axis=1)[:, 0]
        go_right = (pax >= split).astype(jnp.int32)
        return jnp.where(is_inner, child + go_right, node)

    return lax.fori_loop(0, scene.tree_depth, body, node0)


def ray_box(o, d, lo, hi, tmin, tmax):
    """Slab test; returns (hit, t0, t1). All (P,...)-batched."""
    inv = 1.0 / d
    t_lo = (lo - o) * inv
    t_hi = (hi - o) * inv
    t_nr = jnp.minimum(t_lo, t_hi)
    t_fr = jnp.maximum(t_lo, t_hi)
    t0 = jnp.maximum(tmin, t_nr.max(axis=-1))
    t1 = jnp.minimum(tmax, t_fr.min(axis=-1))
    return t0 < t1, t0, t1


# ----------------------------------------------------------------------------
# basis-function sampling (vectorized addBasisFunctions, exabrick.cu:620-816)
# ----------------------------------------------------------------------------

def sample_basis(scene, rid, pos, channel: int, need_grad: bool = False,
                 allow_empty: bool = False):
    """Sample the basis-weighted field at (P,3) points lying in regions
    (P,) rid.  Returns (ok, value[, grad]) with grad the quotient-rule
    numerator (exabrick.cu:916-921).

    ``allow_empty``: ALLOW_EMPTY_CELLS parity — corners whose scalar
    equals EMPTY_CELL_POISON_VALUE contribute neither weight nor value
    (notEmptyCell, exabrick.cu:614-618); a static flag, so the compare
    is stripped entirely when off."""
    bids = scene.region_bricks[rid]  # (P, K)
    valid_b = bids >= 0
    b = jnp.clip(bids, 0, None)
    lower = scene.brick_lower[b]  # (P, K, 3)
    size = scene.brick_size[b]  # (P, K, 3)
    cw = scene.brick_cell_width[b]  # (P, K)
    begin = scene.brick_begin[b]  # (P, K)

    local = (pos[:, None, :] - lower) / cw[..., None] - 0.5
    idx_lo = jnp.maximum(jnp.floor(local).astype(jnp.int32), -1)
    frac = local - idx_lo.astype(local.dtype)
    neg = 1.0 - frac

    idx = idx_lo[:, :, None, :] + _CORNERS[None, None]  # (P, K, 8, 3)
    inb = (idx >= 0) & (idx < size[:, :, None, :])
    live = inb.all(-1) & valid_b[:, :, None]  # (P, K, 8)

    hi_w = frac[:, :, None, :]
    lo_w = neg[:, :, None, :]
    w3 = jnp.where(_CORNERS[None, None] == 1, hi_w, lo_w)  # (P, K, 8, 3)
    w = w3.prod(-1)

    ic = jnp.clip(idx, 0, jnp.maximum(size[:, :, None, :] - 1, 0))
    lin = begin[:, :, None] + ic[..., 0] + size[:, :, None, 0] * (
        ic[..., 1] + size[:, :, None, 1] * ic[..., 2]
    )
    s = scene.scalars[channel][lin]  # (P, K, 8) gather

    if allow_empty:
        live = live & (s != EMPTY_CELL_POISON_VALUE)
    w = jnp.where(live, w, 0.0)
    sw = w.sum((-1, -2))
    swv = (w * s).sum((-1, -2))
    ok = sw > 1e-20
    value = swv / jnp.where(ok, sw, 1.0)

    if not need_grad:
        return ok, value

    sign = jnp.where(_CORNERS[None, None] == 1, 1.0, -1.0)  # (1,1,8,3)
    wx, wy, wz = w3[..., 0], w3[..., 1], w3[..., 2]
    d3 = jnp.stack([wz * wy, wz * wx, wy * wx], axis=-1) * sign
    d3 = jnp.where(live[..., None], d3, 0.0)
    sdc = d3.sum((-3, -2))  # (P, 3)
    sd = (d3 * s[..., None]).sum((-3, -2))
    grad = sw[:, None] * sd - swv[:, None] * sdc
    return ok, value, grad


def sample_nearest(scene, rid, pos, channel: int):
    """Non-basis sampling: clamp-to-brick nearest cell fetch
    (exabrick.cu:807-815).  In this mode each region is exactly one brick
    (build_brick_regions).  Always valid."""
    b = jnp.clip(scene.region_bricks[rid][:, 0], 0, None)
    lower = scene.brick_lower[b]
    size = scene.brick_size[b]
    cw = scene.brick_cell_width[b]
    begin = scene.brick_begin[b]
    idx = jnp.clip(
        jnp.floor((pos - lower) / cw[:, None]).astype(jnp.int32),
        0, jnp.maximum(size - 1, 0),
    )
    lin = begin + idx[:, 0] + size[:, 0] * (idx[:, 1] + size[:, 1] * idx[:, 2])
    value = scene.scalars[channel][lin]
    return jnp.ones_like(value, bool), value


def gradient_cd(scene, pos, channel: int, delta, basis_method: bool = True,
                act_mask=None, fixed_rid=None, allow_empty: bool = False):
    """Central-difference gradient (gradientCD, exabrick.cu:832-880).

    Default: per-offset leaf relocation (FAST_CENTRAL_DIFFERENCES=OFF).
    Offsets falling outside the domain — or, when ``act_mask`` is given,
    in a culled region (the reference's TF-culled BVH returns leafID=-1
    there) — contribute 0.  With ``fixed_rid`` (P,), samples stay in the
    caller's region (FAST_CENTRAL_DIFFERENCES=ON, exabrick.cu:850-852).
    Returns f(pos-δe_i) - f(pos+δe_i) per axis, the reference's sign
    convention (s[1]-s[0])."""
    p = pos.shape[0]
    delta = jnp.broadcast_to(delta, (p,))
    # all 6 offset points in one (6P,3) batch: one BSP descent + one
    # basis gather instead of six
    eye = jnp.eye(3, dtype=pos.dtype)
    offs = jnp.concatenate([eye, -eye], axis=0)  # (6,3): +x+y+z then -x-y-z
    q = pos[None, :, :] + offs[:, None, :] * delta[None, :, None]  # (6,P,3)
    qf = q.reshape(6 * p, 3)
    if fixed_rid is not None:
        rc = jnp.tile(fixed_rid, 6)
        inside = jnp.ones(6 * p, bool)
    else:
        node = locate_leaf(scene, qf)
        rid = scene.tree_leaf[node]
        inside = rid >= 0
        rc = jnp.clip(rid, 0, None)
        if act_mask is not None:
            inside = inside & act_mask[rc]
    if basis_method:
        ok, v = sample_basis(scene, rc, qf, channel,
                             allow_empty=allow_empty)
    else:
        ok, v = sample_nearest(scene, rc, qf, channel)
    v = jnp.where(inside & ok, v, 0.0).reshape(6, p)
    return (v[3:] - v[:3]).T  # (P,3): f(pos-δ) - f(pos+δ)


# ----------------------------------------------------------------------------
# per-frame region activity (TF-aware space skipping)
# ----------------------------------------------------------------------------

def region_active_mask(scene, fs, num_channels: int):
    """(N,) bool: does any channel's transfer function give this region's
    value range non-zero opacity? (exabrick.cu:250-304)"""
    m = jnp.zeros(scene.region_value_range.shape[0], bool)
    for c in range(num_channels):
        m = m | active_for_volume_sampling(
            fs.xf_lut[c], fs.xf_domain[c], fs.xf_opacity_scale,
            scene.region_value_range,
        )
    return m


# ----------------------------------------------------------------------------
# the integrator
# ----------------------------------------------------------------------------

def _march_region(scene, fs, cfg, o, d, rid, active, t0, t1, offset, rgba,
                  act_mask=None):
    """March sample intervals within one region per ray
    (integrateBrick, exabrick.cu:1116-1185; PROPER_DISTANCE path)."""
    finest_cw = scene.region_finest_cw[jnp.clip(rid, 0, None)]
    dt = fs.dt * finest_cw

    i0 = jnp.ceil((t0 - dt * offset) / dt)
    t_i = (offset + i0) * dt
    # replicate the grid-snap fix-up loops (exabrick.cu:1141-1144)
    for _ in range(3):
        t_i = jnp.where(t_i - dt >= t0, t_i - dt, t_i)
    for _ in range(3):
        t_i = jnp.where(t_i < t0, t_i + dt, t_i)

    marching = active & (t1 > t0)
    t_last = t0

    def cond(state):
        marching, *_ = state
        return marching.any()

    def body(state):
        marching, t_i, t_last, rgba = state
        t_next = jnp.minimum(t_i, t1)
        t_sample = 0.5 * (jnp.minimum(t1, t_next) + t_last)
        actual_dt = t_next - t_last
        pos = o + t_sample[:, None] * d

        for c in range(cfg.num_channels):
            if not cfg.basis_method:
                ok, value = sample_nearest(scene, rid, pos, c)
                if cfg.gradient_shading_dvr:
                    # non-basis mode always shades via central differences
                    # with delta=(level+1)/2 (exabrick.cu:930-940)
                    lvl = jnp.log2(finest_cw)
                    frid = rid if cfg.fast_central_differences else None
                    grad = gradient_cd(scene, pos, c, (lvl + 1.0) * 0.5,
                                       False, act_mask, frid)
                else:
                    grad = None
            elif cfg.gradient_shading_dvr and not cfg.analytic_gradients:
                ok, value = sample_basis(scene, rid, pos, c,
                                         allow_empty=cfg.allow_empty_cells)
                # delta=(finestLevelCellWidth+1)/2 (exabrick.cu:924)
                frid = rid if cfg.fast_central_differences else None
                grad = gradient_cd(scene, pos, c, (finest_cw + 1.0) * 0.5,
                                   True, act_mask, frid,
                                   allow_empty=cfg.allow_empty_cells)
            elif cfg.gradient_shading_dvr:
                ok, value, grad = sample_basis(
                    scene, rid, pos, c, True,
                    allow_empty=cfg.allow_empty_cells)
            else:
                ok, value = sample_basis(scene, rid, pos, c,
                                         allow_empty=cfg.allow_empty_cells)
                grad = None
            sample = lookup_xf(
                fs.xf_lut[c], fs.xf_domain[c], fs.xf_opacity_scale, value
            )
            rgb, a = sample[:, :3], sample[:, 3]
            if grad is not None:
                g2 = (grad * grad).sum(-1)
                shade = jnp.abs((-d * grad).sum(-1)) / jnp.sqrt(
                    jnp.maximum(g2, 1e-38)
                )
                use = jnp.sqrt(g2) > finest_cw * 1e-6
                rgb = jnp.where(use[:, None], rgb * shade[:, None], rgb)
            a = 1.0 - (1.0 - a) ** actual_dt
            take = marching & ok & (actual_dt != 0.0)
            contrib = (1.0 - rgba[:, 3]) * a
            contrib = jnp.where(take, contrib, 0.0)
            rgba = jnp.concatenate(
                [
                    rgba[:, :3] + contrib[:, None] * rgb,
                    (rgba[:, 3] + contrib)[:, None],
                ],
                axis=1,
            )

        stop = (rgba[:, 3] >= TERMINATION_THRESHOLD) | (t_next >= t1)
        return marching & ~stop, t_i + dt, t_next, rgba

    _, _, _, rgba = lax.while_loop(cond, body, (marching, t_i, t_last, rgba))
    return rgba


def trace_dvr(scene, fs, cfg: RenderConfig, o_world, d_world, offset,
              t_end_world=None, t_start_world=None, return_stats=False):
    """Volume-integrate a batch of rays (raygen DVR loop,
    exabrick.cu:1662-1699).  Returns accumulated RGBA (P,4); with
    ``return_stats`` also the per-ray region-iteration counts (the
    deterministic analog of the clock heat map, exabrick.cu:1703-1707)."""
    p = o_world.shape[0]
    m = scene.voxel_from_world
    hi = lax.Precision.HIGHEST  # TPU default dot precision is bf16
    o = jnp.matmul(o_world, m[:, :3].T, precision=hi) + m[:, 3]
    d = jnp.matmul(d_world, m[:, :3].T, precision=hi)
    dt_scale = jnp.linalg.norm(d, axis=-1)
    d = d / dt_scale[:, None]

    if t_end_world is None:
        t_end = jnp.full(p, 2e10, o.dtype)
    else:
        t_end = t_end_world * dt_scale
    if t_start_world is None:
        t_start = jnp.zeros(p, o.dtype)
    else:
        t_start = t_start_world * dt_scale

    # clip to the union of region domains (the BSP root box — extends half
    # a cell beyond the brick bounds, like the reference's BVH of domains)
    hitb, tb0, tb1 = ray_box(
        o, d, scene.tree_lo[0], scene.tree_hi[0], t_start, t_end,
    )

    if cfg.space_skipping:
        act_mask = region_active_mask(scene, fs, cfg.num_channels)
    else:
        act_mask = jnp.ones(scene.region_value_range.shape[0], bool)

    span = jnp.maximum(tb1 - tb0, 0.0)
    eps = jnp.maximum(span * 1e-6, 1e-5)

    # initial carries derived from varying inputs (shard_map vma typing)
    rgba0 = jnp.zeros((p, 4), o.dtype) + 0.0 * o[:, :1]
    done0 = ~hitb
    t_cur0 = jnp.maximum(tb0, 0.0)
    iters0 = jnp.zeros_like(t_cur0)

    def cond(state):
        it, done, *_ = state
        return (it < cfg.max_region_iters) & ~done.all()

    def body(state):
        it, done, t_cur, rgba, iters = state
        limit = jnp.minimum(t_end, tb1)
        alive = ~done & (t_cur < limit)

        probe = o + jnp.minimum(t_cur + eps, limit)[:, None] * d
        node = locate_leaf(scene, probe)
        lo = scene.tree_lo[node]
        hi = scene.tree_hi[node]
        rid = scene.tree_leaf[node]
        hit, t0, t1 = ray_box(o, d, lo, hi, t_cur, limit)
        # guard: if the probe missed (degenerate/zero-width leaf), step
        # forward by eps to guarantee progress
        t1 = jnp.where(hit, t1, t_cur + eps)

        active = alive & hit & (rid >= 0) & act_mask[jnp.clip(rid, 0, None)]
        rgba = _march_region(
            scene, fs, cfg, o, d, jnp.clip(rid, 0, None), active,
            t0, t1, offset, rgba, act_mask,
        )

        saturated = rgba[:, 3] >= TERMINATION_THRESHOLD
        newly = alive & saturated & ~done
        # exabrick.cu:1694-1697: collapse to premultiplied-opaque
        rgba = jnp.where(
            newly[:, None],
            jnp.concatenate(
                [rgba[:, :3] * rgba[:, 3:4], jnp.ones((p, 1), rgba.dtype)],
                axis=1,
            ),
            rgba,
        )
        done = done | ~alive | saturated
        t_cur = jnp.where(alive, t1 * REGION_ADVANCE_EPS, t_cur)
        done = done | (t_cur >= limit)
        iters = iters + alive.astype(iters.dtype)
        return it + 1, done, t_cur, rgba, iters

    _, _, _, rgba, iters = lax.while_loop(
        cond, body, (0, done0, t_cur0, rgba0, iters0)
    )
    if return_stats:
        return rgba, iters
    return rgba


# ----------------------------------------------------------------------------
# full frame: rays -> rgba -> composite over background -> accumulate
# ----------------------------------------------------------------------------

def linear_to_srgb(x):
    return jnp.where(
        x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(jnp.maximum(x, 1e-20), 1 / 2.4) - 0.055
    )


def generate_rays(fs, width: int, height: int, jitter=None):
    """Per-pixel rays from the frame state camera (programs/Camera.h:27-44).
    jitter: (P,2) in [0,1) or None for pixel centers."""
    px = jnp.tile(jnp.arange(width, dtype=jnp.float32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.float32), width)
    if jitter is None:
        jx = jy = 0.5
    else:
        jx = jitter[:, 0]
        jy = jitter[:, 1]
    d = (
        fs.cam_dir00[None]
        + (px + jx)[:, None] * fs.cam_du[None]
        + (py + jy)[:, None] * fs.cam_dv[None]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(fs.cam_pos, d.shape)
    return o, d


def composite_background(rgba, bg):
    w = rgba[:, 3:4]
    return w * rgba[:, :3] + (1.0 - w) * bg


def accumulate(color, accum, frame_id):
    """Progressive accumulation (exabrick.cu:1709-1719).  Returns
    (new_accum, display_color_srgb)."""
    color = jnp.where(frame_id > 0, color + accum[:, :3], color)
    new_accum = jnp.concatenate(
        [color, jnp.ones((color.shape[0], 1), color.dtype)], axis=1
    )
    shown = color / (frame_id + 1.0)
    return new_accum, linear_to_srgb(shown)


def pack_rgba8(color_srgb):
    """(P,3) float -> (P,) uint32 RGBA8 (exabrick.cu:62-76)."""
    c = jnp.clip((color_srgb * 256.0).astype(jnp.int32), 0, 255).astype(jnp.uint32)
    return c[:, 0] | (c[:, 1] << 8) | (c[:, 2] << 16) | jnp.uint32(0xFF000000)
