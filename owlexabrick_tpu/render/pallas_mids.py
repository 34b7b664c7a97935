"""Pallas x-resample kernel for the camera-product mids.

The orbit (moving-camera) path's dominant cost is NOT the kernel sweep
but the per-frame camera products: building dense x tent matrices
(max(0, 1-|qx-k|) broadcasts materialize (S, W, KX) temps — ~15 GB of
HLO output bytes per frame at 256^3, measured in PERFORMANCE.md note
20) and the windowed x einsums that consume them.  This kernel moves
the whole x stage into VMEM: per (slab, column-tile) grid step it
builds the (nx, tc) tent from a (1, tc) strip of slab-plane x
coordinates with a broadcasted iota and contracts the z-lerped lattice
block against it on the MXU — HBM sees only the (S, ny, nx) z-resampled
blocks in and the (S, ny8, Wp) mids out.  No tent matrices, no window
stacks, no einsum temps.

Semantics match slabs.py's einsum path exactly: tent weight
max(0, 1 - |qx - k|) for k in [0, nx), zero outside (lattice index k
runs over the level's real x extent; out-of-range taps never existed
in the dense matrix either).  Output rows are padded to a multiple of
8 with zeros and columns to the column-tile multiple — the layout
``prepare_chunk`` pads mids to anyway (its pads become no-ops).

Precision: "highest" = one HIGHEST dot (full f32, Mosaic's accurate
in-kernel option — slightly above the einsum path's bf16x3 HIGH);
"hi_lo" = the mid split into a bf16 (hi, lo) pair in-register and TWO
single-bf16 passes against a bf16 tent (exact block reconstruction to
~2^-16; the tent's single-bf16 rounding largely cancels in the swv/sw
ratio downstream, the same argument as the sweep kernel's hi_lo dots).

Reference context: this replaces the x-resample half of what the CUDA
reference's per-sample basis reconstruction does implicitly
(programs/exabrick.cu:620-777); the slab factorization itself is
documented in render/slabs.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def _make_kernel(n_comp: int, ny: int, ny8: int, nx: int, tc: int,
                 precision: str, out_dtype):
    hi_lo = precision == "hi_lo"
    pad_r = ny8 - ny

    def kernel(*refs):
        qx_ref = refs[0]
        zv_refs = refs[1:1 + n_comp]
        out_refs = refs[1 + n_comp:]

        q = qx_ref[0, 0, :]  # (tc,)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (nx, tc), 0).astype(f32)
        tent = jnp.maximum(0.0, 1.0 - jnp.abs(iota - q[None, :]))
        if hi_lo:
            tent = tent.astype(jnp.bfloat16)
        for c in range(n_comp):
            plane = zv_refs[c][0]  # (ny, nx)
            if hi_lo:
                phi = plane.astype(jnp.bfloat16)
                plo = (plane - phi.astype(f32)).astype(jnp.bfloat16)
                res = (
                    jnp.dot(phi, tent, preferred_element_type=f32)
                    + jnp.dot(plo, tent, preferred_element_type=f32)
                )
            else:
                res = jnp.dot(plane, tent, preferred_element_type=f32,
                              precision=jax.lax.Precision.HIGHEST)
            if pad_r:
                res = jnp.concatenate(
                    [res, jnp.zeros((pad_r, tc), f32)], axis=0)
            out_refs[c][0] = res.astype(out_dtype)

    return kernel


def xresample_mids(zvs: Sequence[jax.Array], qx: jax.Array, tc: int,
                   precision: str = "highest",
                   out_dtype=jnp.float32,
                   interpret: bool | None = None) -> list:
    """x-resample a level's z-lerped lattice blocks to screen columns.

    zvs: per component (channel mids + mask mid) (S, ny, nx) f32;
    qx: (S, Wp) f32 slab-plane lattice x coordinates, Wp a multiple of
    ``tc`` (pad columns should sit <= -2 so their tent weights vanish
    and the padded mid columns come out exactly zero, matching
    prepare_chunk's zero pad).  Returns per component (S, ny8, Wp)
    arrays with ny8 = ny rounded up to 8 (zero rows past ny).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s_, ny, nx = zvs[0].shape
    wp = qx.shape[1]
    if wp % tc:
        raise ValueError(f"qx width {wp} not a multiple of tc={tc}")
    n_ct = wp // tc
    ny8 = -(-ny // 8) * 8
    n_comp = len(zvs)

    grid = (s_, n_ct)
    zv_spec = pl.BlockSpec((1, ny, nx), lambda s, ct: (s, 0, 0),
                           memory_space=pltpu.VMEM)
    # Mosaic needs the last two block dims divisible by (8, 128) or
    # equal to the array dims; an (S, Wp) strip can't express a
    # (1, tc) block, so the strip rides broadcast to 8 sublanes
    qx8 = jnp.broadcast_to(qx[:, None, :], (s_, 8, wp))
    qx_spec = pl.BlockSpec((1, 8, tc), lambda s, ct: (s, 0, ct),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ny8, tc), lambda s, ct: (s, 0, ct),
                            memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((s_, ny8, wp), out_dtype)
                 for _ in range(n_comp)]
    kernel = _make_kernel(n_comp, ny, ny8, nx, tc, precision, out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qx_spec] + [zv_spec] * n_comp,
        out_specs=[out_spec] * n_comp,
        out_shape=out_shape,
        interpret=interpret,
    )(qx8, *zvs)


def kernel_mids_vmem_bytes(ny: int, nx: int, tc: int,
                           n_comp: int) -> int:
    """Rough VMEM footprint of one grid step (double-buffered blocks)."""
    ny8 = -(-ny // 8) * 8
    return 2 * (n_comp * ny * nx * 4      # zv blocks
                + n_comp * ny8 * tc * 4   # out blocks
                + tc * 4)                 # qx strip
