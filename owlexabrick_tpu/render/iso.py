"""Implicit iso-surface ray marching (traceIsoRay, exabrick.cu:1408-1460 +
IsoSurfaceIntegrationFunction, exabrick.cu:1018-1114).

Same wavefront structure as the DVR core: BSP point location to enumerate
region intervals, masked lockstep marching inside.  Regions are culled by
iso activity (an enabled iso value inside the region's value range,
exabrick.cu:373-402) instead of transfer-function opacity.

Per ray and channel we track the previous sample (value, t); a crossing of
an enabled iso value between consecutive samples produces a hit at the
distance-weighted average t.  Matching the reference's quirk: within the
first region containing any crossing, the *first* crossing fixes the
color and the *last* crossing fixes t_hit and the shading normal.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..core.constants import REGION_ADVANCE_EPS
from .xf import lookup_xf


def iso_region_mask(scene, fs):
    """(N,) bool: region value range contains any enabled iso value."""
    vr = scene.region_value_range
    m = jnp.zeros(vr.shape[0], bool)
    for i in range(fs.iso_enabled.shape[0]):
        m = m | (
            fs.iso_enabled[i]
            & (fs.iso_value[i] >= vr[:, 0])
            & (fs.iso_value[i] <= vr[:, 1])
        )
    return m


def _detect_crossings(scene, fs, cfg, rid, pos, t_sample, marching,
                      last_val, last_t, found_color, t_hit, color, normal,
                      d, act_mask=None):
    """One sample step of every channel's integration functor."""
    from .dvr import gradient_cd, sample_basis

    new_last_val = last_val
    new_last_t = last_t
    for c in range(cfg.num_channels):
        if cfg.gradient_shading_iso and cfg.analytic_gradients:
            ok, value, _ = sample_basis(scene, rid, pos, c, True)
        else:
            ok, value = sample_basis(scene, rid, pos, c)
        prev_v = last_val[:, c]
        prev_t = last_t[:, c]
        have_prev = prev_v >= -1e35

        for i in range(fs.iso_enabled.shape[0]):
            iso = fs.iso_value[i]
            crossing = (
                marching
                & ok
                & have_prev
                & fs.iso_enabled[i]
                & (fs.iso_channel[i] == c)
                & (((prev_v <= iso) & (value >= iso))
                   | ((prev_v >= iso) & (value <= iso)))
            )
            d1 = jnp.abs(prev_v - iso)
            d2 = jnp.abs(value - iso)
            denom = jnp.where(d1 + d2 > 0, d1 + d2, 1.0)
            w1 = 1.0 - d1 / denom
            w2 = 1.0 - d2 / denom
            tavg = prev_t * w1 + t_sample * w2
            isopt = pos + (tavg - t_sample)[:, None] * d

            # re-sample at the crossing point (exabrick.cu:1058-1098)
            if cfg.gradient_shading_iso:
                if cfg.analytic_gradients:
                    rok, rval, grad = sample_basis(scene, rid, isopt, c, True)
                else:
                    # gradientCD<ISO=true>: CD with per-offset relocation
                    # through the iso-culled BVH (exabrick.cu:860-866, 924)
                    rok, rval = sample_basis(scene, rid, isopt, c)
                    fcw = scene.region_finest_cw[rid]
                    frid = rid if cfg.fast_central_differences else None
                    grad = gradient_cd(scene, isopt, c, (fcw + 1.0) * 0.5,
                                       True, act_mask, frid)
                gl = jnp.linalg.norm(grad, axis=-1, keepdims=True)
                g = grad / jnp.maximum(gl, 1e-20)
                # face forward
                g = jnp.where(((g * d).sum(-1) > 0)[:, None], -g, g)
                g = jnp.where(jnp.isfinite(g).all(-1, keepdims=True), g, 0.0)
                g = jnp.where((gl > 0), g, 0.0)
            else:
                rok, rval = sample_basis(scene, rid, isopt, c)
                g = jnp.zeros_like(pos)
            samp = lookup_xf(
                fs.xf_lut[c], fs.xf_domain[c], fs.xf_opacity_scale, rval
            )
            rgb = jnp.where(
                rok[:, None], samp[:, :3],
                jnp.asarray([1.0, 0.0, 0.0])[None],
            )
            if cfg.colormap_channel != 0:
                cok, cval = sample_basis(
                    scene, rid, isopt, cfg.colormap_channel
                )
                csamp = lookup_xf(
                    fs.xf_lut[0], fs.xf_domain[0], fs.xf_opacity_scale, cval
                )
                rgb = jnp.where(cok[:, None], csamp[:, :3], rgb)

            glen = jnp.linalg.norm(g, axis=-1)
            shade = 0.3 + 0.7 * jnp.abs((-d * g).sum(-1)) / jnp.maximum(
                glen, 1e-20
            )
            rgb = jnp.where((glen > 0.0)[:, None], rgb * shade[:, None], rgb)

            # first crossing colors, last crossing positions (see module doc)
            color = jnp.where(
                (crossing & ~found_color)[:, None], rgb, color
            )
            t_hit = jnp.where(crossing, tavg, t_hit)
            normal = jnp.where(crossing[:, None], g, normal)
            found_color = found_color | crossing

        upd = marching & ok
        new_last_val = new_last_val.at[:, c].set(
            jnp.where(upd, value, new_last_val[:, c])
        )
        new_last_t = new_last_t.at[:, c].set(
            jnp.where(upd, t_sample, new_last_t[:, c])
        )
    return new_last_val, new_last_t, found_color, t_hit, color, normal


def trace_iso_rays(scene, fs, cfg, o_world, d_world, tmin_world, tmax_world):
    """Returns (t_hit_world (P,), normal (P,3), color (P,3)); inf on miss."""
    p = o_world.shape[0]
    m = scene.voxel_from_world
    hi = lax.Precision.HIGHEST  # TPU default dot precision is bf16
    o = jnp.matmul(o_world, m[:, :3].T, precision=hi) + m[:, 3]
    d = jnp.matmul(d_world, m[:, :3].T, precision=hi)
    dt_scale = jnp.linalg.norm(d, axis=-1)
    d = d / dt_scale[:, None]

    t_end = tmax_world * dt_scale
    hitb, tb0, tb1 = ray_box_root(scene, o, d, tmin_world * dt_scale, t_end)
    act = iso_region_mask(scene, fs)

    span = jnp.maximum(tb1 - tb0, 0.0)
    eps = jnp.maximum(span * 1e-6, 1e-5)

    c = cfg.num_channels
    zc = 0.0 * dt_scale[:, None]  # varying-zero helpers (shard_map vma)
    state = dict(
        it=0,
        done=~hitb,
        t_cur=jnp.maximum(tb0, 0.0),
        last_val=jnp.full((p, c), -1e36) + zc,
        last_t=jnp.zeros((p, c)) + zc,
        found=jnp.zeros_like(hitb),
        t_hit=jnp.full(p, jnp.inf) + zc[:, 0],
        color=0.0 * o,
        normal=0.0 * o,
    )
    keys = list(state.keys())

    def cond(s):
        s = dict(zip(keys, s))
        return (s["it"] < cfg.max_region_iters) & ~s["done"].all()

    def body(s):
        s = dict(zip(keys, s))
        limit = jnp.minimum(t_end, tb1)
        alive = ~s["done"] & (s["t_cur"] < limit)
        from .dvr import locate_leaf, ray_box

        probe = o + jnp.minimum(s["t_cur"] + eps, limit)[:, None] * d
        node = locate_leaf(scene, probe)
        rid = scene.tree_leaf[node]
        hit, t0, t1 = ray_box(
            o, d, scene.tree_lo[node], scene.tree_hi[node], s["t_cur"], limit
        )
        t1 = jnp.where(hit, t1, s["t_cur"] + eps)
        active = alive & hit & (rid >= 0) & act[jnp.clip(rid, 0, None)]
        rids = jnp.clip(rid, 0, None)

        # march this interval (grid like integrateBrick)
        finest_cw = scene.region_finest_cw[rids]
        dt = fs.dt * finest_cw
        i0 = jnp.ceil(t0 / dt)
        t_i = i0 * dt
        for _ in range(3):
            t_i = jnp.where(t_i - dt >= t0, t_i - dt, t_i)
        for _ in range(3):
            t_i = jnp.where(t_i < t0, t_i + dt, t_i)

        mstate = (
            active & (t1 > t0), t_i, t0,
            s["last_val"], s["last_t"], s["found"],
            s["t_hit"], s["color"], s["normal"],
        )

        def mcond(ms):
            return ms[0].any()

        def mbody(ms):
            marching, t_i, t_last, last_val, last_t, found, t_hit, color, normal = ms
            t_next = jnp.minimum(t_i, t1)
            t_sample = 0.5 * (jnp.minimum(t1, t_next) + t_last)
            pos = o + t_sample[:, None] * d
            last_val, last_t, found, t_hit, color, normal = _detect_crossings(
                scene, fs, cfg, rids, pos, t_sample, marching,
                last_val, last_t, found, t_hit, color, normal, d, act,
            )
            stop = t_next >= t1
            return (
                marching & ~stop, t_i + dt, t_next,
                last_val, last_t, found, t_hit, color, normal,
            )

        _, _, _, last_val, last_t, found, t_hit, color, normal = (
            lax.while_loop(mcond, mbody, mstate)
        )

        done = s["done"] | ~alive | found
        t_cur = jnp.where(alive, t1 * REGION_ADVANCE_EPS, s["t_cur"])
        done = done | (t_cur >= limit)
        return tuple(
            dict(
                it=s["it"] + 1, done=done, t_cur=t_cur,
                last_val=last_val, last_t=last_t, found=found,
                t_hit=t_hit, color=color, normal=normal,
            )[k]
            for k in keys
        )

    out = lax.while_loop(cond, body, tuple(state[k] for k in keys))
    s = dict(zip(keys, out))
    t_hit_world = jnp.where(s["found"], s["t_hit"] / dt_scale, jnp.inf)
    return t_hit_world, s["normal"], s["color"]


def ray_box_root(scene, o, d, tmin, tmax):
    from .dvr import ray_box

    return ray_box(o, d, scene.tree_lo[0], scene.tree_hi[0], tmin, tmax)
