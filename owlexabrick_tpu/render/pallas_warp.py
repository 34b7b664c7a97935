"""Pallas homography-warp kernels for the shear-warp fast path.

The final step of shear-warp resamples the intermediate image at
projectively-mapped screen positions.  A per-pixel gather runs at XLA's
~0.1 G lookups/s (~200 ms/frame at 1080p — slower than the whole
sweep); these kernels restructure the resample as two dense 1-D passes
(the two-pass transform of Catmull & Smith):

  pass 1 (vertical): V[v, a] = I[j(v, a), a] — for each screen row v
    and intermediate column a, Catmull-Rom along the column.  j(v, a)
    follows from inverting the screen->lattice homography's i-equation
    for u at fixed (v, a) (projective in each variable, closed form).
    Kernel: (8, 128) tiles over (v, a); the column window is DMA'd to
    VMEM and reduced with an FMA loop over its rows.
  pass 2 (horizontal): out[v, u] = V[v, i(u, v)] — Catmull-Rom along
    the (already vertically-sheared) rows.  Kernel: pixel-major
    (1024, Bi) weights against the row window replicated per pixel row;
    one elementwise multiply + lane reduce per channel.

The two-pass filter equals the tensor-product filter wherever the map
is locally a pure translation and remains an interpolating resample
everywhere (taps follow the sheared footprint).  HBM sees each window
once, the V intermediate once, and the output planes once — no
scattered lookups.  Window sizes are static buckets chosen per
factorization from the homography's derivative bounds; the XLA gather
warp remains the fallback for maps the buckets cannot cover."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 8
_TC = 128


def _catmull_rom(d):
    """Catmull-Rom kernel value at distance ``d`` >= 0 (support < 2)."""
    d2 = d * d
    d3 = d2 * d
    near = 1.5 * d3 - 2.5 * d2 + 1.0
    far = -0.5 * d3 + 2.5 * d2 - 4.0 * d + 2.0
    return jnp.where(d <= 1.0, near, jnp.where(d < 2.0, far, 0.0))


def _safe_div(n, d):
    mag = jnp.maximum(jnp.abs(d), 1e-20)
    return n / jnp.where(d < 0, -mag, mag)


def _j_of_va(h, vc, a_shifted, shift_j):
    """j(v, a): invert the i-equation for u at fixed (vc, a), then apply
    the j-equation.  ``h`` is the flat (16,) param vector (hom (2,2,3)
    rows over centered (uc, vc, 1) in h[0:12])."""
    uc = _safe_div(
        a_shifted * (h[4] * vc + h[5]) - h[1] * vc - h[2],
        h[0] - a_shifted * h[3],
    )
    j = _safe_div(
        h[6] * uc + h[7] * vc + h[8],
        h[9] * uc + h[10] * vc + h[11],
    ) - shift_j
    return j


def _make_pass1(bj: int, ih: int, n_chan: int, height: int):
    """V[v, a] = I[j(v, a), a] over (8, 128) tiles of (v, a)."""

    def kernel(params_ref, wj0_ref, img_ref, *out_and_scratch):
        outs = out_and_scratch[:n_chan]
        win, sem = out_and_scratch[n_chan:]
        vt = pl.program_id(1)
        at = pl.program_id(0)

        j0w = pl.multiple_of(wj0_ref[vt, at], 8)
        a0 = pl.multiple_of(at * _TC, 128)
        dma = pltpu.make_async_copy(
            img_ref.at[:, pl.ds(j0w, bj), pl.ds(a0, _TC)], win, sem
        )
        dma.start()

        h = params_ref  # (16,): hom (2,2,3) + jx, jy, shift_i, shift_j
        f32 = jnp.float32
        vc = (
            (vt * _TR
             + jax.lax.broadcasted_iota(jnp.int32, (_TR, _TC), 0)
             ).astype(f32)
            + (h[13] - height / 2.0)
        )
        a = (
            at * _TC
            + jax.lax.broadcasted_iota(jnp.int32, (_TR, _TC), 1)
        ).astype(f32) + h[14]  # lattice column + shift_i
        j = _j_of_va(h, vc, a, h[15])
        j = jnp.clip(j, 1.0, ih - 2.0 - 1e-4) - j0w.astype(f32)
        j = jnp.clip(j, 1.0, bj - 2.0)

        dma.wait()
        # per output row: (Bj, 128) weights against the window, reduced
        # over sublanes (vectorized; no dynamic slices in the hot loop)
        rows_idx = jax.lax.broadcasted_iota(
            jnp.int32, (bj, _TC), 0
        ).astype(f32)
        for v in range(_TR):
            jv = j[v : v + 1, :]  # (1, 128)
            w = _catmull_rom(jnp.abs(jv - rows_idx))  # (Bj, 128)
            for c in range(n_chan):
                outs[c][v : v + 1, :] = jnp.sum(
                    w * win[c], axis=0, keepdims=True
                )

    return kernel


def _make_pass2(bi: int, iw: int, n_chan: int, width: int, height: int):
    """out[v, u] = V[v, i(u, v)] over pixel-major (1024,) strips."""
    px = _TR * _TC

    def kernel(params_ref, wi0_ref, v_ref, *out_and_scratch):
        outs = out_and_scratch[:n_chan]
        win, sem = out_and_scratch[n_chan:]
        vt = pl.program_id(1)
        ut = pl.program_id(0)

        i0w = pl.multiple_of(wi0_ref[vt, ut], 128)
        r0 = pl.multiple_of(vt * _TR, 8)
        dma = pltpu.make_async_copy(
            v_ref.at[:, pl.ds(r0, _TR), pl.ds(i0w, bi)], win, sem
        )
        dma.start()

        h = params_ref
        f32 = jnp.float32
        p = jax.lax.broadcasted_iota(jnp.int32, (px, 1), 0)
        u = (ut * _TC + (p % _TC)).astype(f32) + (h[12] - width / 2.0)
        v = (vt * _TR + (p // _TC)).astype(f32) + (h[13] - height / 2.0)
        i = _safe_div(
            h[0] * u + h[1] * v + h[2],
            h[3] * u + h[4] * v + h[5],
        ) - h[14]
        i = jnp.clip(i, 1.0, iw - 2.0 - 1e-4) - i0w.astype(f32)
        i = jnp.clip(i, 1.0, bi - 2.0)  # (px, 1)

        cols = jax.lax.broadcasted_iota(jnp.int32, (px, bi), 1).astype(f32)
        wi = _catmull_rom(jnp.abs(i - cols))  # (px, Bi), shared by chans

        dma.wait()
        for c in range(n_chan):
            # per-pixel row(p) = p // _TC: process one V row per static
            # step ((_TC, Bi) elementwise + lane reduce)
            for r in range(_TR):
                seg = win[c, pl.ds(r, 1), :]  # (1, Bi)
                wir = wi[r * _TC : (r + 1) * _TC, :]
                val = jnp.sum(wir * seg, axis=1, keepdims=True)  # (_TC, 1)
                if c == 3:
                    val = jnp.clip(val, 0.0, 1.0)
                else:
                    val = jnp.maximum(val, 0.0)
                outs[c][r * _TC : (r + 1) * _TC, :] = val

    return kernel


def _hom_eval(sw, uu, vv):
    hom = np.asarray(sw.hom, np.float64)
    w2, h2 = sw.screen[0] / 2.0, sw.screen[1] / 2.0
    uc, vc = uu - w2, vv - h2
    i = (hom[0, 0, 0] * uc + hom[0, 0, 1] * vc + hom[0, 0, 2]) / (
        hom[0, 1, 0] * uc + hom[0, 1, 1] * vc + hom[0, 1, 2]
    )
    j = (hom[1, 0, 0] * uc + hom[1, 0, 1] * vc + hom[1, 0, 2]) / (
        hom[1, 1, 0] * uc + hom[1, 1, 1] * vc + hom[1, 1, 2]
    )
    return i, j


def warp_windows(sw, width: int, height: int,
                 bi_buckets=(256, 384, 512),
                 bj_buckets=(32, 64, 128, 224)):
    """Static window sizing from the map's derivative bounds.

    Returns (bi, bj) — pass-2 column window and pass-1 row window — or
    None when no bucket covers the warp (the caller falls back to the
    XLA gather warp).  Evaluated once per factorization on the host."""
    iw, ih = sw.width, sw.height
    uu, vv = np.meshgrid(
        np.linspace(0.0, width, 33), np.linspace(0.0, height, 33)
    )
    i, j = _hom_eval(sw, uu, vv)
    su = width / 32.0
    sv = height / 32.0
    didu = np.abs(np.diff(i, axis=1)).max() / su
    didv = np.abs(np.diff(i, axis=0)).max() / sv
    # pass-1 j-variation per lattice column: dj/da = (dj/du)/(di/du),
    # evaluated pointwise on the probe grid
    dj_du = np.diff(j, axis=1) / su
    di_du = np.diff(i, axis=1) / su
    djda = np.abs(dj_du / np.where(np.abs(di_du) < 1e-12, 1e-12, di_du))
    djda = djda.max()
    djdv = np.abs(np.diff(j, axis=0)).max() / sv
    # span over one tile + bicubic support + jitter + start quantization
    need_i = didu * _TC + didv * _TR + 6 + 128
    need_j = djda * _TC + djdv * _TR + 6 + 8
    bi = next((b for b in bi_buckets if need_i <= b <= iw), None)
    bj = next((b for b in bj_buckets if need_j <= b <= ih), None)
    if bi is None or bj is None:
        return None
    return bi, bj


def warp_pallas(rgba_i, sw, width: int, height: int, bi: int, bj: int,
                jx=0.5, jy=0.5, shift_i=0.0, shift_j=0.0,
                interpret: bool | None = None):
    """Two-pass tile-window Pallas warp.  rgba_i: (iw*ih, C) from the
    sweep.  Returns (width*height, C)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _warp_pallas_impl(
        rgba_i, jnp.asarray(np.asarray(sw.hom), jnp.float32),
        jnp.asarray(jx, jnp.float32), jnp.asarray(jy, jnp.float32),
        jnp.asarray(shift_i, jnp.float32), jnp.asarray(shift_j, jnp.float32),
        iw=sw.width, ih=sw.height, width=width, height=height,
        bi=bi, bj=bj, interpret=interpret,
    )



@partial(jax.jit, static_argnames=(
    "iw", "ih", "width", "height", "bi", "bj", "interpret"))
def _warp_pallas_impl(rgba_i, hom_arr, jx, jy, shift_i, shift_j, *,
                      iw: int, ih: int, width: int, height: int,
                      bi: int, bj: int, interpret: bool):
    n_chan = rgba_i.shape[1]
    img = rgba_i.T.reshape(n_chan, ih, iw)
    f32 = jnp.float32

    n_vt = pl.cdiv(height, _TR)
    n_at = pl.cdiv(iw, _TC)
    n_ut = pl.cdiv(width, _TC)
    h_pad = n_vt * _TR

    hom = hom_arr
    extra = jnp.stack([jx, jy, shift_i, shift_j])
    params = jnp.concatenate([hom.reshape(12), extra])

    # ---- pass 1 windows: j(v, a) extrema at tile corners (projective in
    # each variable -> monotone along tile edges)
    cv = (
        jnp.arange(n_vt + 1, dtype=f32)[:, None] * _TR
        + (jy - height / 2.0)
    )
    ca = jnp.arange(n_at + 1, dtype=f32)[None, :] * _TC + shift_i
    cj = _j_of_va(params, cv, ca, shift_j)

    def starts(c, n_src, b, quant):
        lo = jnp.minimum(
            jnp.minimum(c[:-1, :-1], c[:-1, 1:]),
            jnp.minimum(c[1:, :-1], c[1:, 1:]),
        )
        s = jnp.floor(jnp.clip(lo, 0.0, n_src - 1.0)).astype(jnp.int32) - 2
        s = (s // quant) * quant
        return jnp.clip(s, 0, n_src - b)

    wj0 = starts(cj, ih, bj, 8)  # (n_vt, n_at)

    v_planes = pl.pallas_call(
        _make_pass1(bj, ih, n_chan, height),
        grid=(n_at, n_vt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.SMEM),  # wj0
            pl.BlockSpec(memory_space=pltpu.ANY),  # intermediate image
        ],
        out_specs=tuple(
            pl.BlockSpec((_TR, _TC), lambda a, v: (v, a),
                         memory_space=pltpu.VMEM)
            for _ in range(n_chan)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((h_pad, n_at * _TC), f32)
            for _ in range(n_chan)
        ),
        scratch_shapes=[
            pltpu.VMEM((n_chan, bj, _TC), f32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(params, wj0, img)
    v_img = jnp.stack(v_planes)  # (C, h_pad, iw)

    # ---- pass 2 windows: i(u, v) extrema at tile corners
    cu2 = jnp.arange(n_ut + 1, dtype=f32)[None, :] * _TC + (jx - width / 2.0)
    cv2 = (
        jnp.arange(n_vt + 1, dtype=f32)[:, None] * _TR
        + (jy - height / 2.0)
    )
    ci = (hom[0, 0, 0] * cu2 + hom[0, 0, 1] * cv2 + hom[0, 0, 2]) / (
        hom[0, 1, 0] * cu2 + hom[0, 1, 1] * cv2 + hom[0, 1, 2]
    ) - shift_i
    wi0 = starts(ci, iw, bi, 128)  # (n_vt, n_ut)

    px = _TR * _TC
    outs = pl.pallas_call(
        _make_pass2(bi, iw, n_chan, width, height),
        grid=(n_ut, n_vt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.SMEM),  # wi0
            pl.BlockSpec(memory_space=pltpu.ANY),  # V
        ],
        # per-tile pixel-major strips (relayout-free stores); un-tiled
        # to (H, W) below
        out_specs=tuple(
            pl.BlockSpec((px, 1), lambda u, v: (v * n_ut + u, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_chan)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_vt * n_ut * px, 1), f32)
            for _ in range(n_chan)
        ),
        scratch_shapes=[
            pltpu.VMEM((n_chan, _TR, bi), f32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(params, wi0, v_img)
    tiled = jnp.stack([o.reshape(n_vt, n_ut, _TR, _TC) for o in outs])
    full = tiled.transpose(0, 1, 3, 2, 4).reshape(
        n_chan, n_vt * _TR, n_ut * _TC
    )
    return full[:, :height, :width].reshape(n_chan, height * width).T
