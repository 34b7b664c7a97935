"""Pallas TPU kernel: transfer-function classification.

Evaluates a 128-knot piecewise-linear RGBA lookup per pixel without
gathers (no TPU vector-gather hardware) and without materializing the
127 intermediate ramp images that the pure-XLA clamp chain produces
(measured: XLA splits the chain into ~127 fusions of a full 126 MB
temp each — 16 GB of HBM traffic per slab; this kernel keeps the
whole accumulation in VMEM, touching HBM once for u and once per
output component).

Algorithm: f(u) = lut[0] + sum_k (lut[k+1] - lut[k]) * clamp(u - k, 0, 1)
for clamped texel coordinates u in [0, N-1] — exact PWL reconstruction
of the reference's CUDA texture lookup (programs/exabrick.cu:136-150).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xf_kernel(d_ref, u_ref, r_ref, g_ref, b_ref, a_ref):
    u = u_ref[:]
    n = d_ref.shape[0]

    def body(k, accs):
        r, g, b, a = accs
        ramp = jnp.clip(u - (k - 1).astype(u.dtype), 0.0, 1.0)
        return (
            r + ramp * d_ref[k, 0],
            g + ramp * d_ref[k, 1],
            b + ramp * d_ref[k, 2],
            a + ramp * d_ref[k, 3],
        )

    base = [jnp.full_like(u, d_ref[0, c]) for c in range(4)]
    r, g, b, a = jax.lax.fori_loop(1, n, body, tuple(base))
    r_ref[:] = r
    g_ref[:] = g
    b_ref[:] = b
    a_ref[:] = a


def _classify_field_kernel(params_ref, lut_ref, d_ref, sw_ref, swv_ref,
                           sec_ref, r_ref, g_ref, b_ref, a_ref):
    """Fused per-slab classification tile:

      field = swv/sw (invalid -> alpha 0)           exabrick.cu:800-806
      u     = texel coord of field in the domain    exabrick.cu:136-150
      rgba  = PWL LUT at u, *range-limited*: only the knots between the
              tile's min and max u are walked (volume fields are smooth
              per tile, so typically a handful instead of all 127)
      alpha = 1 - (1-a)^(dz*sec)                    exabrick.cu:1011
    """
    n = lut_ref.shape[0]
    lo = params_ref[0]
    hi = params_ref[1]
    dz = params_ref[2]
    n_rows = params_ref[3].astype(jnp.int32)
    n_cols = params_ref[4].astype(jnp.int32)

    sw = sw_ref[:]
    swv = swv_ref[:]
    ok = sw > 1e-20
    value = swv / jnp.where(ok, sw, 1.0)

    s = (n - 1) * (value - lo) / ((hi - lo) + 1e-20)
    s = jnp.clip(s + 0.5, 0.0, n - 1.0) / (n - 1.0)
    u = jnp.clip(s * n - 0.5, 0.0, n - 1.0)

    # remainder tiles contain out-of-bounds garbage (possibly NaN) that
    # must not poison the tile-wide knot range
    tr, tc = sw.shape
    row0 = pl.program_id(0) * tr
    col0 = pl.program_id(1) * tc
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
    inb = (rows < n_rows) & (cols < n_cols)
    u = jnp.where(inb, u, 0.0)
    ok = ok & inb

    k_lo = jnp.clip(
        jnp.floor(jnp.min(jnp.where(inb, u, n - 1.0))).astype(jnp.int32),
        0, n - 2,
    )
    k_hi = jnp.clip(
        jnp.floor(jnp.max(jnp.where(inb, u, 0.0))).astype(jnp.int32),
        0, n - 2,
    )

    def body(k, accs):
        r, g, b, a = accs
        ramp = jnp.clip(u - k.astype(u.dtype), 0.0, 1.0)
        return (
            r + ramp * d_ref[k + 1, 0],
            g + ramp * d_ref[k + 1, 1],
            b + ramp * d_ref[k + 1, 2],
            a + ramp * d_ref[k + 1, 3],
        )

    base = [jnp.full_like(u, lut_ref[k_lo, c]) for c in range(4)]
    r, g, b, a = jax.lax.fori_loop(k_lo, k_hi + 1, body, tuple(base))

    a = 1.0 - jnp.power(jnp.maximum(1.0 - a, 0.0), dz * sec_ref[:])
    a = jnp.where(ok, a, 0.0)
    r_ref[:] = r
    g_ref[:] = g
    b_ref[:] = b
    a_ref[:] = a


def classify_field(sw: jax.Array, swv: jax.Array, sec: jax.Array,
                   lut: jax.Array, domain, dz, *,
                   interpret: bool | None = None):
    """Fused field->rgba classification for a chunk of slabs.

    sw, swv: (S, H, W) basis weight / weighted-value sums; sec: (H, W)
    per-pixel path-length factor; lut: (N, 4) alpha-prescaled LUT;
    domain: (2,); dz: scalar slab thickness.
    Returns (r, g, b, a): each (S, H, W); a is opacity-corrected and 0
    where the sample is invalid.
    """
    s_, h, w = sw.shape
    n = lut.shape[0]
    d = jnp.concatenate([lut[:1], lut[1:] - lut[:-1]], axis=0)
    params = jnp.stack(
        [jnp.asarray(domain[0], jnp.float32),
         jnp.asarray(domain[1], jnp.float32),
         jnp.asarray(dz, jnp.float32),
         jnp.asarray(s_ * h, jnp.float32),
         jnp.asarray(w, jnp.float32)]
    )

    swf = sw.reshape(s_ * h, w)
    swvf = swv.reshape(s_ * h, w)

    tr = 8
    tc = 512 if w % 512 == 0 else (256 if w % 256 == 0 else 128)
    grid = (pl.cdiv(s_ * h, tr), pl.cdiv(w, tc))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile = lambda i, j: (i, j)
    if h % tr == 0:
        rows_per_img = h // tr  # tiles never straddle slab boundaries
        sec_tile = lambda i, j: (i % rows_per_img, j)
    else:
        # small/odd image heights: expand sec to the full stack so tile
        # rows can straddle slab boundaries safely
        sec = jnp.broadcast_to(sec[None], (s_, h, w)).reshape(s_ * h, w)
        sec_tile = tile
    out = pl.pallas_call(
        _classify_field_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lut
            pl.BlockSpec(memory_space=pltpu.SMEM),  # d
            pl.BlockSpec((tr, tc), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, tc), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, tc), sec_tile, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((tr, tc), tile, memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((s_ * h, w), jnp.float32) for _ in range(4)
        ),
        interpret=interpret,
    )(params, lut, d, swf, swvf, sec)
    return tuple(x.reshape(s_, h, w) for x in out)


def _composite_chunk_kernel(params_ref, lut_ref, d_ref, live_ref,
                            sw_ref, swv_ref, sec_ref,
                            r_ref, g_ref, b_ref, t_ref):
    """Classify AND front-to-back composite a whole chunk of slabs in one
    pass: per (8 x tc) pixel tile, loop the chunk's S slabs in VMEM,
    producing the chunk's premultiplied rgb and accumulated transparency.

    Removes the (S,H,W)-sized rgba intermediates and the cumprod passes of
    the XLA formulation — HBM is touched once for sw/swv in and once for
    the 4 output images.
    """
    n = lut_ref.shape[0]
    lo = params_ref[0]
    hi = params_ref[1]
    dz = params_ref[2]
    n_rows = params_ref[3].astype(jnp.int32)
    n_cols = params_ref[4].astype(jnp.int32)

    s_count = sw_ref.shape[0]
    tr, tc = sw_ref.shape[1], sw_ref.shape[2]
    row0 = pl.program_id(0) * tr
    col0 = pl.program_id(1) * tc
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
    inb = (rows < n_rows) & (cols < n_cols)
    sec = sec_ref[:]

    def slab(s, carry):
        r_acc, g_acc, b_acc, t_run = carry
        sw = sw_ref[s]
        swv = swv_ref[s]
        # TF-culled slabs contribute nothing (live gate folded into ok;
        # chunk-level culling outside skips fully-dead chunks, and the
        # chunk while_loop stops once every pixel saturates)
        ok = (sw > 1e-20) & inb & (live_ref[s] > 0.0)
        value = swv / jnp.where(sw > 1e-20, sw, 1.0)

        sc = (n - 1) * (value - lo) / ((hi - lo) + 1e-20)
        sc = jnp.clip(sc + 0.5, 0.0, n - 1.0) / (n - 1.0)
        u = jnp.clip(sc * n - 0.5, 0.0, n - 1.0)
        u = jnp.where(inb, u, 0.0)

        k_lo = jnp.clip(
            jnp.floor(jnp.min(jnp.where(inb, u, n - 1.0))).astype(jnp.int32),
            0, n - 2,
        )
        k_hi = jnp.clip(
            jnp.floor(jnp.max(jnp.where(inb, u, 0.0))).astype(jnp.int32),
            0, n - 2,
        )

        def knot(k, accs):
            r, g, b, a = accs
            ramp = jnp.clip(u - k.astype(u.dtype), 0.0, 1.0)
            return (
                r + ramp * d_ref[k + 1, 0],
                g + ramp * d_ref[k + 1, 1],
                b + ramp * d_ref[k + 1, 2],
                a + ramp * d_ref[k + 1, 3],
            )

        base = [jnp.full_like(u, lut_ref[k_lo, c]) for c in range(4)]
        r, g, b, a = jax.lax.fori_loop(k_lo, k_hi + 1, knot, tuple(base))

        a = 1.0 - jnp.power(jnp.maximum(1.0 - a, 0.0), dz * sec)
        a = jnp.where(ok, a, 0.0)
        contrib = t_run * a
        return (
            r_acc + contrib * r,
            g_acc + contrib * g,
            b_acc + contrib * b,
            t_run * (1.0 - a),
        )

    z = jnp.zeros((tr, tc), jnp.float32)
    r, g, b, t = jax.lax.fori_loop(
        0, s_count, slab, (z, z, z, jnp.ones((tr, tc), jnp.float32))
    )
    r_ref[:] = r
    g_ref[:] = g
    b_ref[:] = b
    t_ref[:] = t


def composite_chunk(sw: jax.Array, swv: jax.Array, sec: jax.Array,
                    live: jax.Array, lut: jax.Array, domain, dz, *,
                    interpret: bool | None = None):
    """Fused classification + front-to-back compositing of a slab chunk.

    sw, swv: (S, H, W); sec: (H, W); live: (S,) float (0/1).
    Returns (rgb (3, H, W) premultiplied chunk color, trans (H, W) chunk
    transparency) — merge into the frame with
    color += (1-alpha) * rgb ; alpha = 1 - (1-alpha) * trans.
    """
    s_, h, w = sw.shape
    n = lut.shape[0]
    d = jnp.concatenate([lut[:1], lut[1:] - lut[:-1]], axis=0)
    params = jnp.stack(
        [jnp.asarray(domain[0], jnp.float32),
         jnp.asarray(domain[1], jnp.float32),
         jnp.asarray(dz, jnp.float32),
         jnp.asarray(h, jnp.float32),
         jnp.asarray(w, jnp.float32)]
    )

    tr = 8
    tc = 512 if w % 512 == 0 else (256 if w % 256 == 0 else 128)
    grid = (pl.cdiv(h, tr), pl.cdiv(w, tc))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile3 = pl.BlockSpec((s_, tr, tc), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
    tile2 = pl.BlockSpec((tr, tc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    r, g, b, t = pl.pallas_call(
        _composite_chunk_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lut
            pl.BlockSpec(memory_space=pltpu.SMEM),  # d
            pl.BlockSpec(memory_space=pltpu.SMEM),  # live
            tile3, tile3, tile2,
        ],
        out_specs=(tile2, tile2, tile2, tile2),
        out_shape=tuple(
            jax.ShapeDtypeStruct((h, w), jnp.float32) for _ in range(4)
        ),
        interpret=interpret,
    )(params, lut, d, live.astype(jnp.float32), sw, swv, sec)
    return jnp.stack([r, g, b]), t


def xf_classify(u: jax.Array, lut: jax.Array, *, interpret: bool | None = None):
    """u: (R, C) clamped texel coords in [0, N-1]; lut: (N, 4).

    Returns (r, g, b, a), each (R, C) float32.
    """
    rdim, cdim = u.shape
    n = lut.shape[0]
    # d[0] = base value, d[k>=1] = slope delta of knot k-1 -> k
    d = jnp.concatenate([lut[:1], lut[1:] - lut[:-1]], axis=0)

    tr = 256 if rdim % 256 == 0 else 8
    tc = 512 if cdim % 512 == 0 else 128
    grid = (pl.cdiv(rdim, tr), pl.cdiv(cdim, tc))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        _xf_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # d (N,4), whole
            pl.BlockSpec((tr, tc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((tr, tc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rdim, cdim), jnp.float32) for _ in range(4)
        ),
        interpret=interpret,
    )(d, u)
    return out
