"""Pallas slab-sweep megakernel: interpolation + classification +
compositing of a whole slab chunk in a single VMEM-resident pass.

Pipeline split (per chunk of S slabs):
  host/XLA side (cheap, small tensors):
    * z-tent resample of each level grid at the chunk's slab planes
    * x-tent resample to screen columns: mid[level] = slab @ Wx^T,
      shape (S, ny_level, W) — a few MB
  kernel (grid over 8 x tc pixel tiles):
    * per slab, per level: build the 8-row y-tent weight block from the
      slab's affine y coordinates and contract (8, ny) @ (ny, tc) on the
      MXU against the mid block -> tile field sums
    * classification (range-limited PWL LUT) + opacity correction
    * front-to-back composite across the chunk's slabs

Removes the (S, H, W) sw/swv intermediates entirely: HBM sees only the
per-level mids (≈2x finest-level rows) and the four output images.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(n_levels: int, ny_list: Tuple[int, ...]):
    def kernel(params_ref, lut_ref, d_ref, live_ref, orgy_ref, cw_ref,
               *refs):
        # refs: per level: qy (S, tr) is NOT passed; we compute y weights
        # from scale/oy params; refs layout:
        #   [mid_v_0, mid_m_0, ..., mid_v_{L-1}, mid_m_{L-1},
        #    ypos_ref (S, tr), sec_ref (tr, tc), r, g, b, t]
        mids = refs[: 2 * n_levels]
        ypos_ref = refs[2 * n_levels]  # (tr, S): y coords per row per slab
        sec_ref = refs[2 * n_levels + 1]
        r_ref, g_ref, b_ref, t_ref = refs[2 * n_levels + 2:]

        n = lut_ref.shape[0]
        lo = params_ref[0]
        hi = params_ref[1]
        dz = params_ref[2]
        n_rows = params_ref[3].astype(jnp.int32)
        n_cols = params_ref[4].astype(jnp.int32)

        s_count = ypos_ref.shape[1]
        tr = ypos_ref.shape[0]
        tc = sec_ref.shape[1]
        # grid is (col_tiles, row_tiles): rows iterate fastest so the
        # column-indexed mid blocks stay resident across row steps
        row0 = pl.program_id(1) * tr
        col0 = pl.program_id(0) * tc
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
        inb = (rows < n_rows) & (cols < n_cols)
        sec = sec_ref[:]

        ypos_all = ypos_ref[:]  # (tr, S)
        slab_ids = jax.lax.broadcasted_iota(jnp.int32, ypos_all.shape, 1)

        def slab(s, carry):
            r_acc, g_acc, b_acc, t_run = carry
            # select slab s's column via a masked reduce (Mosaic has no
            # unaligned dynamic lane indexing)
            yp = jnp.sum(jnp.where(slab_ids == s, ypos_all, 0.0), axis=1)

            sw = jnp.zeros((tr, tc), jnp.float32)
            swv = jnp.zeros((tr, tc), jnp.float32)
            for li in range(n_levels):
                ny = ny_list[li]
                # y-tent weights for this tile's rows on level li's lattice
                qy = yp / cw_ref[li] - orgy_ref[li] - 0.5  # (tr,)
                k = jax.lax.broadcasted_iota(jnp.int32, (tr, ny), 1).astype(
                    jnp.float32
                )
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(qy[:, None] - k))
                mv = mids[2 * li][s]  # (ny, tc)
                mm = mids[2 * li + 1][s]
                swv = swv + jnp.dot(wy, mv,
                                    preferred_element_type=jnp.float32)
                sw = sw + jnp.dot(wy, mm,
                                  preferred_element_type=jnp.float32)

            ok = (sw > 1e-20) & inb & (live_ref[s] > 0.0)
            value = swv / jnp.where(sw > 1e-20, sw, 1.0)

            sc = (n - 1) * (value - lo) / ((hi - lo) + 1e-20)
            sc = jnp.clip(sc + 0.5, 0.0, n - 1.0) / (n - 1.0)
            u = jnp.clip(sc * n - 0.5, 0.0, n - 1.0)
            u = jnp.where(inb, u, 0.0)

            k_lo = jnp.clip(
                jnp.floor(jnp.min(jnp.where(inb, u, n - 1.0))).astype(
                    jnp.int32
                ), 0, n - 2,
            )
            k_hi = jnp.clip(
                jnp.floor(jnp.max(jnp.where(inb, u, 0.0))).astype(jnp.int32),
                0, n - 2,
            )

            def knot(kk, accs):
                r, g, b, a = accs
                ramp = jnp.clip(u - kk.astype(u.dtype), 0.0, 1.0)
                return (
                    r + ramp * d_ref[kk + 1, 0],
                    g + ramp * d_ref[kk + 1, 1],
                    b + ramp * d_ref[kk + 1, 2],
                    a + ramp * d_ref[kk + 1, 3],
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

    return kernel


def sweep_chunk(mids: Sequence[Tuple[jax.Array, jax.Array]],
                origins_y, cell_widths, y_pos, sec, live,
                lut, domain, dz, height: int, width: int, *,
                interpret: bool | None = None):
    """Run the sweep megakernel for one chunk.

    mids: per level (mid_v (S, ny, W), mid_m (S, ny, W)) — x-resampled,
    z-lerped level slabs; origins_y / cell_widths: per-level scalars;
    y_pos: (S, H) slab-plane y coordinates; sec: (H, W); live: (S,).
    Returns (rgb (3,H,W), trans (H,W)).
    """
    n_levels = len(mids)
    s_ = y_pos.shape[0]
    n = lut.shape[0]
    d = jnp.concatenate([lut[:1], lut[1:] - lut[:-1]], axis=0)
    params = jnp.stack(
        [jnp.asarray(domain[0], jnp.float32),
         jnp.asarray(domain[1], jnp.float32),
         jnp.asarray(dz, jnp.float32),
         jnp.asarray(height, jnp.float32),
         jnp.asarray(width, jnp.float32)]
    )
    orgy = jnp.stack([jnp.asarray(o, jnp.float32) for o in origins_y])
    cws = jnp.stack([jnp.asarray(c, jnp.float32) for c in cell_widths])

    # fat row tiles keep the per-slab (tr, ny) @ (ny, tc) contraction
    # MXU-shaped; fall back to 8 rows for small images
    tr = next((t for t in (120, 64, 32, 16, 8) if height % t == 0), 8)
    tc = 512 if width % 512 == 0 else (256 if width % 256 == 0 else 128)
    grid = (pl.cdiv(width, tc), pl.cdiv(height, tr))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # params
        pl.BlockSpec(memory_space=pltpu.SMEM),  # lut
        pl.BlockSpec(memory_space=pltpu.SMEM),  # d
        pl.BlockSpec(memory_space=pltpu.SMEM),  # live
        pl.BlockSpec(memory_space=pltpu.SMEM),  # orgy
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cw
    ]
    args = [params, lut, d, live.astype(jnp.float32), orgy, cws]
    ny_list = []
    for mv, mm in mids:
        ny = mv.shape[1]
        ny_list.append(ny)
        spec = pl.BlockSpec((s_, ny, tc), lambda j, i: (0, 0, j),
                            memory_space=pltpu.VMEM)
        in_specs += [spec, spec]
        args += [mv, mm]
    # y positions per slab for this tile's rows, (H, S) so the small slab
    # axis sits in the (full-width) lane dimension
    in_specs.append(
        pl.BlockSpec((tr, s_), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    )
    args.append(y_pos.T)
    in_specs.append(
        pl.BlockSpec((tr, tc), lambda j, i: (i, j), memory_space=pltpu.VMEM)
    )
    args.append(sec)

    tile2 = pl.BlockSpec((tr, tc), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM)
    r, g, b, t = pl.pallas_call(
        _make_kernel(n_levels, tuple(ny_list)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(tile2, tile2, tile2, tile2),
        out_shape=tuple(
            jax.ShapeDtypeStruct((height, width), jnp.float32)
            for _ in range(4)
        ),
        interpret=interpret,
    )(*args)
    return jnp.stack([r, g, b]), t
