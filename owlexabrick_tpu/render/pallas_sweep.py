"""Pallas slab-sweep megakernel: interpolation + classification +
compositing of a whole slab chunk in a single VMEM-resident pass.

Pipeline split (per chunk of S slabs):
  host/XLA side (cheap, small tensors):
    * z-tent resample of each level grid at the chunk's slab planes
    * x-tent resample to screen columns -> per-level mids (S, ny, W)
    * y-windowing: a row tile of tr pixel rows only reaches
      ~tr*dy/cw + 3 lattice rows of each level, so per-level mids are
      sliced into per-row-tile windows (R, S, KY, W) — the kernel's
      contraction K drops from the level's full ny (hundreds at 256^3+)
      to the window size (tens), and the VMEM-resident block shrinks
      with it (deeper chunks fit).  Window sizes are static compile
      hints (``ky_hints`` from the host camera); without hints the full
      rows are used (same code path, KY = ny).
  kernel (grid over (col, row) tiles, rows fastest; hoisted tents flip
  to rows-outer so the per-row-tile tent blocks stay VMEM-resident
  across the column sweep):
    * per slab: y-tent weights contracted against the mid blocks on
      the MXU.  Default (concat_levels): the levels' blocks arrive
      pre-concatenated along the contraction axis and the combined
      tent builds in one fused expression over static per-lane level
      maps — ONE (tr, sum KY_l) @ (sum KY_l, tc) dot per component per
      pass (small per-level K underutilizes the MXU's 128-deep
      pipeline).  Per-level grouping (concat_levels=False) keeps one
      dot per level; fuse_mids additionally lane-fuses
      [channels | mask] into (KY, (C+1)*tc) blocks
    * classification (two-sided-windowed PWL knots or the dense
      range-limited LUT loop) + opacity correction (optical-depth exp
      for tau-fitted strips, pow otherwise), skipped for tiles with no
      field support or saturated tiles; adaptive stride weights widen
      coarse-only steps
    * front-to-back composite across the chunk's slabs

HBM sees only the per-level (windowed) mids and the four output images
— no (S, H, W) intermediates.

DMA-window mode (``SlabConfig.dma_mids``, default): the y windows are
not materialized at all — HBM keeps ONE unwindowed f32 mid per (level,
component) and the kernel copies its own (S, KY_l, tc) windows into
double-buffered VMEM scratch (``pltpu.make_async_copy`` with dynamic
8-aligned row offsets from ``ChunkPrep.k0y``), concatenated along the
contraction axis so each slab still pays one dot per component.  The
hi/lo split happens in-register at dot time.  This deletes the window
stacks, the hi_lo split pass, and the level-concat pass from the camera
products — on the moving-camera path those were ~60% of the per-frame
product bytes — and shrinks the static-pose cache ~4x (it stores plain
mids, not R overlapping window copies).  Output agrees with the copy
pipeline to float rounding (the K partition differs, so MXU sums
accumulate in a different order; threshold pixels at the 0.98
saturation collapse can flip, same class as concat_levels).

The per-chunk work splits into three stages so a static camera pose
caches everything camera-dependent (render_slabs_camera's
``camera_cache``): ``prepare_chunk`` (camera-only: pad/interleave/
window/hi_lo-split the mids, hoisted tents, geometric activity, TF-cull
value bounds) -> ``combine_activity`` (per frame, tiny: TF/live masks +
adaptive-stride weights) -> ``run_chunk`` (the Pallas dispatch).
``sweep_chunk`` composes all three for the uncached path.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def tile_shape(height: int, width: int, tiles=(0, 0),
               adaptive_stride: bool = False) -> Tuple[int, int]:
    """The kernel's (rows, cols) tile shape (shared with the host-side
    ky-hint computation).  Fat row tiles keep the (tr, KY) @ (KY, tc)
    contraction MXU-shaped; tc=128 measured fastest at 1080p (wider
    tiles hurt: 384 -> -27%, 640 -> VMEM OOM).  tr = largest
    multiple-of-8 divisor of height up to 256 (1080 -> 216; with
    y-windowed mids the contraction K scales with tr, so large tiles
    stay cheap and their coarser act/stride tables cost little —
    interleaved 256^3: tr216 14.4 vs tr120 13.7 FPS).
    SlabConfig.tile_rows/tile_cols override."""
    tr_cap = 256
    tr = tiles[0] or max(
        (t for t in range(8, tr_cap + 1, 8) if height % t == 0), default=0
    )
    if tr == 0:
        # no multiple-of-8 divisor (e.g. 1080p pixel bands: 540/270/135
        # rows) — the kernel masks padded rows (inb), so pick the
        # largest tile whose padding waste stays under 12.5%; without
        # this, such heights collapsed to 8-row tiles whose per-tile
        # fixed costs dominated (a 540-row band measured 2.6x the full
        # 1080 frame).  Small frames (tests) keep the old tr=8 — their
        # adaptive-stride/activity tables are per-tile, so changing the
        # tile would perturb golden quadrature for no perf stake.
        tr = 8
        if height >= 128:
            for t in range(8, tr_cap + 1, 8):
                if (-(-height // t) * t - height) * 8 <= height:
                    tr = t
    tc = tiles[1] or next(
        (t for t in (512, 256, 128) if width % t == 0), 128
    )
    return tr, tc


def _make_kernel(n_levels: int, ky_list: Tuple[int, ...],
                 windowed: Tuple[bool, ...], n_channels: int,
                 n_texels: int = 0, has_stop: bool = False,
                 dot_precision: str = "highest",
                 tau: Tuple[bool, ...] = (), has_pt: bool = False,
                 fused: bool = True, hoist_wy: bool = False,
                 concat: bool = False,
                 static_cws: Tuple[float, ...] = (),
                 fold: bool = False,
                 nx_list: Tuple[int, ...] = (),
                 knot_unroll: int = 4,
                 dma: bool = False,
                 lattice: bool = False,
                 yfirst: bool = False,
                 grid_rc: Tuple[int, int] = (0, 0),
                 dma_sync: bool = False,
                 has_acc: bool = False):
    compressed = n_texels > 0
    if not tau:
        tau = (False,) * n_channels
    # near-f32 MXU passes by default (the CUDA reference multiplies in
    # f32; TPU default dot precision is bf16 and shows up as ~1e-1
    # compositing error); bf16_interp opts into the fast bf16 path.
    # Mosaic only lowers DEFAULT and HIGHEST dot precisions in-kernel;
    # "hi_lo" splits each mid into a bf16 (hi, lo) pair and runs TWO
    # single-bf16 passes (mid reconstruction exact to ~2^-16; the tent
    # weights run single-bf16, whose error largely cancels in the
    # swv/sw ratio) — ~display-quantum fidelity at a third of HIGHEST's
    # six passes (PERFORMANCE.md inefficiency #2)
    hi_lo = dot_precision == "hi_lo"
    prec = (None if dot_precision in ("default", "hi_lo")
            else jax.lax.Precision.HIGHEST)

    def mxu_dot(a, b):
        if hi_lo:
            a16 = a.astype(jnp.bfloat16)
            return (
                jnp.dot(a16, b[0], preferred_element_type=jnp.float32)
                + jnp.dot(a16, b[1], preferred_element_type=jnp.float32)
            )
        return jnp.dot(a.astype(b.dtype), b,
                       preferred_element_type=jnp.float32,
                       precision=prec)

    def kernel(params_ref, lut_ref, d_ref, cum_ref, pos_ref, live_ref,
               act_ref, act_all_ref, orgy_ref, cw_ref, orgx_ref, *refs):
        # refs: per level ONE fused mid (hi_lo: a (hi, lo) pair) whose
        # lane axis interleaves [v_0 | .. | v_{C-1} | m] per column tile
        # (windowed levels: (1, S, KY, (C+1)*tc) blocks; full levels:
        # (S, ny, (C+1)*tc)), then ypos, sec, (t_slab, t_stop if
        # has_stop), r, g, b, t.
        # orgy_ref: (L, R) per-(level, row-tile) effective y origin
        # (lattice origin + window start).
        # compressed mode: lut_ref = (C, 6) [lo, hi, base rgba],
        # d_ref = (C, M, 5) [breakpoint pos, slope-delta rgba],
        # cum_ref = (C, M+1, 8) prefix sums [sd, sd*pos]
        # (fused=False: per level [mid_v_0 .. mid_v_{C-1}, mid_m]
        # separate refs and one dot per component)
        n_comp_k = (n_channels + 1) if fused else 1
        per_lvl = ((n_channels + 1) if not fused else 1) * (
            2 if hi_lo else 1)
        # concat mode: the levels' mid blocks arrive pre-concatenated
        # along the contraction axis — ONE ref group whose K = sum of
        # the per-level KYs; the kernel's per-level y-tent weights are
        # concatenated to match, so each slab pays one dot per
        # component per pass instead of one per level (small-K dots
        # underutilize the MXU's 128-deep pipeline).
        # fold mode: the blocks are LATTICE-space z-resampled mids
        # (ky, nx) per level per component — the x resample happens
        # in-kernel as a first contraction (ky, nx) @ wx (nx, tc), so
        # HBM never sees screen-width mids at all (the per-level
        # (S, ny, W) x-resampled mids were ~20x these blocks' bytes)
        # dma mode: HBM keeps one UNWINDOWED f32 mid per (level,
        # component); the kernel copies its own (S, KY_l, tc) y-window
        # into double-buffered VMEM scratch (concatenated along the
        # contraction axis) with dynamic row offsets from k0_ref — the
        # per-row-tile window stacks, hi_lo split passes, and level
        # concatenation never touch HBM at all (the hi/lo split happens
        # in-register at dot time).  Same dot shape as concat mode.
        # lattice mode: same HBM-ref unpack as dma (plain per-level
        # per-component blocks + k0 window starts), but the blocks are
        # LATTICE-space (S, ny, nx128) and the kernel runs fold's
        # two-stage contraction out of per-(component, level) scratch
        if dma or lattice:
            k0_ref = refs[0]
            refs = refs[1:]
            per_lvl = n_channels + 1
            n_groups = 1
            hbm_refs = []
            k = 0
            for li in range(n_levels):
                hbm_refs.append(refs[k : k + per_lvl])
                k += per_lvl
            lvl_refs = []
        else:
            if fold:
                per_lvl = (n_channels + 1) * (2 if hi_lo else 1)
            n_groups = 1 if concat else n_levels
            lvl_refs = []
            k = 0
            for li in range(n_groups):
                lvl_refs.append(refs[k : k + per_lvl])
                k += per_lvl
        wy_refs = ()
        if hoist_wy:
            # host-hoisted per-(row-tile, slab) y-tent weight blocks
            # (1, S, tr, KY_l): the tent build is camera-only and
            # column-tile-invariant, so building it in the kernel paid
            # the VPU cost n_ct times per (slab, row tile); hoisted
            # blocks ride the rows-outer grid and stay VMEM-resident
            # across the column sweep
            wy_refs = refs[k : k + n_levels]
            k += n_levels
        ypos_ref = refs[k]
        k += 1
        xpos_ref = None
        if fold or lattice:
            xpos_ref = refs[k]
            k += 1
        sec_ref = refs[k]
        k += 1
        pt_ref = None
        if has_pt:
            # previous chunks' per-pixel transmittance: the compositing
            # carry runs *absolute* (premultiplied outputs), so tiles the
            # earlier chunks saturated skip all slab work — the per-tile
            # form of the reference's terminateRay (exabrick.cu:1694-97)
            pt_ref = refs[k]
            k += 1
        if has_acc:
            # fused framebuffer accumulation: the carry starts from the
            # earlier chunks' accumulated premultiplied rgb (and the pt
            # input above carries ALPHA, not transmittance) — the
            # post-kernel `color + chunk_rgb` / `1 - trans` fusions and
            # the chunk_rgb intermediate never touch HBM
            rin_ref = refs[k]
            gin_ref = refs[k + 1]
            bin_ref = refs[k + 2]
            k += 3
        if has_stop:
            t_slab_ref = refs[k]
            t_stop_ref = refs[k + 1]
            k += 2
        if dma:
            r_ref, g_ref, b_ref, t_ref = refs[k : k + 4]
            scr_refs = refs[k + 4 : k + 4 + (n_channels + 1)]
            dma_sem = refs[k + 4 + (n_channels + 1)]
        elif lattice:
            r_ref, g_ref, b_ref, t_ref = refs[k : k + 4]
            n_scr = (n_channels + 1) * n_levels
            scr_refs = refs[k + 4 : k + 4 + n_scr]  # [comp * L + li]
            dma_sem = refs[k + 4 + n_scr]
            if yfirst:
                # y-dot-first lane: per-(comp, level) T1 scratch holds
                # wy @ block — the y contraction done ONCE per (slab,
                # row tile) at lattice-x width; column tiles then pay
                # only the tiny T1 @ wx dot.  Screen-width mids never
                # exist anywhere (HBM or VMEM).
                t1_refs = refs[k + 5 + n_scr : k + 5 + 2 * n_scr]
        else:
            r_ref, g_ref, b_ref, t_ref = refs[k:]
        n = n_texels if compressed else lut_ref.shape[1]
        dz = params_ref[0]
        n_rows = params_ref[1].astype(jnp.int32)
        n_cols = params_ref[2].astype(jnp.int32)

        s_count = ypos_ref.shape[1]
        tr = ypos_ref.shape[0]
        tc = sec_ref.shape[1]
        # grid order: (col_tiles, row_tiles) with rows fastest normally;
        # hoisted tents and fold mode flip to (row_tiles, col_tiles)
        # with cols fastest so the per-row-tile blocks (tent blocks /
        # lattice mids, column-invariant) load once per row tile
        if hoist_wy or fold or dma or lattice:
            rt_id = pl.program_id(0)
            ct_id = pl.program_id(1)
        else:
            rt_id = pl.program_id(1)
            ct_id = pl.program_id(0)
        row0 = rt_id * tr
        col0 = ct_id * tc
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
        inb = (rows < n_rows) & (cols < n_cols)
        sec = sec_ref[:]

        cur_slot = 0
        if dma:
            # window DMAs, double-buffered across grid steps: wait for
            # this step's windows (started by the previous step), then
            # kick off the next step's into the other slot.  The copies
            # run unconditionally — exactly like the BlockSpec pipeline
            # they replace — so saturation skips only compute.
            n_rt_g, n_ct_g = grid_rc
            total_steps = n_rt_g * n_ct_g
            step = rt_id * n_ct_g + ct_id
            cur_slot = jax.lax.rem(step, 2)
            k_off = []
            o = 0
            for ky in ky_list:
                k_off.append(o)
                o += ky

            def _dma(slot, r_i, c_i, ci_, li):
                # window starts are 8-aligned by construction
                # (prepare_chunk rounds them down); multiple_of lets
                # Mosaic prove the sublane tiling
                k0v = pl.multiple_of(k0_ref[li, r_i], 8)
                # mids arrive as a (n_ct, S, ny, tc) column-tile stack
                # (slabs.py writes each x-einsum block straight into
                # its slot — no minor-axis concat/pad in HBM); index
                # the tile, window the rows
                return pltpu.make_async_copy(
                    hbm_refs[li][ci_].at[
                        c_i, :, pl.ds(k0v, ky_list[li]), :],
                    scr_refs[ci_].at[
                        slot, :,
                        pl.ds(k_off[li], ky_list[li]), :],
                    dma_sem.at[slot, ci_, li],
                )

            def _start_all(slot, r_i, c_i):
                for ci_ in range(n_channels + 1):
                    for li in range(n_levels):
                        _dma(slot, r_i, c_i, ci_, li).start()

            if dma_sync:
                # debug lane: no cross-step pipelining
                cur_slot = 0
                _start_all(0, rt_id, ct_id)
                for ci_ in range(n_channels + 1):
                    for li in range(n_levels):
                        _dma(0, rt_id, ct_id, ci_, li).wait()
            else:
                @pl.when(step == 0)
                def _():
                    _start_all(cur_slot, rt_id, ct_id)

                for ci_ in range(n_channels + 1):
                    for li in range(n_levels):
                        _dma(cur_slot, rt_id, ct_id, ci_, li).wait()

                nstep = step + 1

                @pl.when(nstep < total_steps)
                def _():
                    _start_all(jax.lax.rem(nstep, 2), nstep // n_ct_g,
                               jax.lax.rem(nstep, n_ct_g))

        if lattice:
            # y-window copies shared across the column sweep: lattice
            # blocks are column-tile invariant (full lanes), so each
            # (level, component) window copies ONCE per row tile —
            # double-buffered on row-tile parity, with rt+1's windows
            # prefetched while rt's column sweep computes.  dma mode
            # instead copies per (rt, ct) step because its windows
            # carry a column slice.
            n_rt_g, n_ct_g = grid_rc
            cur_slot = jax.lax.rem(rt_id, 2)

            def _dma_lat(slot, r_i, ci_, li):
                # window starts are 8-aligned by construction
                k0v = pl.multiple_of(k0_ref[li, r_i], 8)
                return pltpu.make_async_copy(
                    hbm_refs[li][ci_].at[:, pl.ds(k0v, ky_list[li]), :],
                    scr_refs[ci_ * n_levels + li].at[slot],
                    dma_sem.at[slot, ci_, li],
                )

            def _start_lat(slot, r_i):
                for ci_ in range(n_channels + 1):
                    for li in range(n_levels):
                        _dma_lat(slot, r_i, ci_, li).start()

            if dma_sync:
                # debug lane: copy + wait at every step
                cur_slot = 0
                _start_lat(0, rt_id)
                for ci_ in range(n_channels + 1):
                    for li in range(n_levels):
                        _dma_lat(0, rt_id, ci_, li).wait()
            else:
                @pl.when((rt_id == 0) & (ct_id == 0))
                def _():
                    _start_lat(0, 0)

                @pl.when(ct_id == 0)
                def _():
                    for ci_ in range(n_channels + 1):
                        for li in range(n_levels):
                            _dma_lat(cur_slot, rt_id, ci_, li).wait()

                @pl.when((ct_id == 0) & (rt_id + 1 < n_rt_g))
                def _():
                    _start_lat(jax.lax.rem(rt_id + 1, 2), rt_id + 1)

        ypos_all = ypos_ref[:]  # (tr, S)
        slab_ids = jax.lax.broadcasted_iota(jnp.int32, ypos_all.shape, 1)

        def _mid_block(li, comp, s):
            # fused: one ref per level (comp ignored); else per component
            if dma:
                # the DMA'd scratch holds f32; the hi/lo split happens
                # here in-register (bit-identical to the host split the
                # prepared blocks carried)
                a = scr_refs[comp][cur_slot, s]
                if hi_lo:
                    ah = a.astype(jnp.bfloat16)
                    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
                    return ah, al
                return a
            if hi_lo:
                rh = lvl_refs[li][2 * comp]
                rl = lvl_refs[li][2 * comp + 1]
                if windowed[li]:
                    return rh[0, s], rl[0, s]
                return rh[s], rl[s]
            ref = lvl_refs[li][comp]
            return ref[0, s] if windowed[li] else ref[s]

        def _wy(li, yp):
            ky = ky_list[li]
            qy = yp / cw_ref[li] - orgy_ref[li, rt_id] - 0.5  # (tr,)
            kk = jax.lax.broadcasted_iota(
                jnp.int32, (tr, ky), 1
            ).astype(jnp.float32)
            return jnp.maximum(0.0, 1.0 - jnp.abs(qy[:, None] - kk))

        if yfirst:
            # fill the T1 scratch once per row tile (at the first column
            # step, after the window DMAs land): per (slab, level, comp)
            # T1 = wy (tr, ky) @ block (ky, nx128) — the y contraction
            # at lattice-x width.  Runs for every slab unconditionally
            # (a later column tile may need a slab this tile gates off);
            # S x L x (C+1) dots of modest K, amortized over the whole
            # column sweep.
            @pl.when(ct_id == 0)
            def _fill_t1():
                def fill(s, _):
                    yp = jnp.sum(
                        jnp.where(slab_ids == s, ypos_all, 0.0), axis=1)
                    for li in range(n_levels):
                        wy = _wy(li, yp)  # (tr, ky)
                        for comp in range(n_channels + 1):
                            a = scr_refs[comp * n_levels + li][
                                cur_slot, s]
                            if hi_lo:
                                ah = a.astype(jnp.bfloat16)
                                al = (a - ah.astype(jnp.float32)).astype(
                                    jnp.bfloat16)
                                wyb = wy.astype(jnp.bfloat16)
                                t1 = (
                                    jnp.dot(wyb, ah,
                                            preferred_element_type=
                                            jnp.float32)
                                    + jnp.dot(wyb, al,
                                              preferred_element_type=
                                              jnp.float32)
                                )
                            else:
                                t1 = jnp.dot(
                                    wy.astype(a.dtype), a,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                            t1_refs[comp * n_levels + li][s] = t1
                    return 0
                jax.lax.fori_loop(0, s_count, fill, 0)

        def _interp_yfirst(s):
            # column-tile stage of the y-first lane: per level apply the
            # x tents to the precomputed T1 — (tr, nx128) @ (nx128, tc)
            # — and sum levels.  hi_lo splits T1 in-register (same
            # numerics class as the lattice lane's p_cat split).
            xpos_all = xpos_ref[:]  # (tc, S)
            sid_x = jax.lax.broadcasted_iota(
                jnp.int32, xpos_all.shape, 1)
            xp = jnp.sum(jnp.where(sid_x == s, xpos_all, 0.0), axis=1)
            wxs = [_wx(li, xp) for li in range(n_levels)]
            fields = []
            for comp in range(n_channels + 1):
                acc = jnp.zeros((tr, tc), jnp.float32)
                for li in range(n_levels):
                    t1 = t1_refs[comp * n_levels + li][s]
                    if hi_lo:
                        th = t1.astype(jnp.bfloat16)
                        tl = (t1 - th.astype(jnp.float32)).astype(
                            jnp.bfloat16)
                        wxb = wxs[li].astype(jnp.bfloat16)
                        acc = acc + (
                            jnp.dot(th, wxb,
                                    preferred_element_type=jnp.float32)
                            + jnp.dot(tl, wxb,
                                      preferred_element_type=jnp.float32)
                        )
                    else:
                        acc = acc + jnp.dot(
                            t1, wxs[li].astype(t1.dtype),
                            preferred_element_type=jnp.float32,
                            precision=prec)
                fields.append(acc)
            sw = fields[n_channels]
            ok = (sw > 1e-20) & inb & (live_ref[s] > 0.0)
            if has_stop:
                ok = ok & (t_slab_ref[s] < t_stop_ref[:])
            return fields, sw, ok

        ktot = sum(ky_list)

        def _wy_cat(yp):
            # concat mode: ONE tent build over the concatenated
            # contraction axis.  The per-lane level map (reciprocal cell
            # width + window base) is static except the row-tile y
            # origins, composed from SMEM scalars with static lane
            # selects — same elementwise cost as the per-level builds,
            # no in-kernel concatenation shuffles.  1/cw is exact (cell
            # widths are powers of two).
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, ktot), 1)
            icw = jnp.zeros((1, ktot), jnp.float32)
            base = jnp.zeros((1, ktot), jnp.float32)
            off = 0
            for li, ky in enumerate(ky_list):
                sel = (lane >= off) & (lane < off + ky)
                icw = jnp.where(sel, 1.0 / static_cws[li], icw)
                base = jnp.where(
                    sel, orgy_ref[li, rt_id] + (0.5 - float(off)), base
                )
                off += ky
            q = yp[:, None] * icw - (base + lane.astype(jnp.float32))
            return jnp.maximum(0.0, 1.0 - jnp.abs(q))

        def _wx(li, xp):
            # fold mode: per-level x-tent weights over the tile's
            # columns — (nx_l, tc) with the lattice axis on sublanes so
            # it feeds the first contraction's RHS directly.  Out-of-
            # range columns get zero weight, exactly like the host
            # x-resample's tent matrix.
            nx = nx_list[li]
            qx = xp / cw_ref[li] - orgx_ref[li] - 0.5  # (tc,)
            kk = jax.lax.broadcasted_iota(
                jnp.int32, (nx, tc), 0
            ).astype(jnp.float32)
            return jnp.maximum(0.0, 1.0 - jnp.abs(qx[None, :] - kk))

        def _interp_fold(s, yp):
            # two-stage contraction per slab: per level
            # P_l = M_l (ky_l, nx_l) @ wx_l (nx_l, tc), levels
            # concatenated along sublanes, then field = wy (tr, sumKY)
            # @ P (sumKY, tc).  hi_lo splits both M (prepared) and P
            # (in-kernel); wx/wy run single-bf16 there (their error
            # largely cancels in the swv/sw ratio, as in the base lane)
            xpos_all = xpos_ref[:]  # (tc, S)
            sid_x = jax.lax.broadcasted_iota(
                jnp.int32, xpos_all.shape, 1)
            xp = jnp.sum(jnp.where(sid_x == s, xpos_all, 0.0), axis=1)
            wy = _wy_cat(yp)
            wxs = [_wx(li, xp) for li in range(n_levels)]

            def first_dot(li, comp):
                if lattice:
                    # DMA'd scratch holds f32 lattice windows; hi/lo
                    # splits here in-register (same numerics as the
                    # dma-mode y-dot split)
                    a = scr_refs[comp * n_levels + li][cur_slot, s]
                    if hi_lo:
                        ah = a.astype(jnp.bfloat16)
                        al = (a - ah.astype(jnp.float32)).astype(
                            jnp.bfloat16)
                        wxb = wxs[li].astype(jnp.bfloat16)
                        return (
                            jnp.dot(ah, wxb,
                                    preferred_element_type=jnp.float32)
                            + jnp.dot(al, wxb,
                                      preferred_element_type=jnp.float32)
                        )
                    return jnp.dot(a, wxs[li].astype(a.dtype),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
                if hi_lo:
                    rh = lvl_refs[li][2 * comp]
                    rl = lvl_refs[li][2 * comp + 1]
                    ah = rh[0, s] if windowed[li] else rh[s]
                    al = rl[0, s] if windowed[li] else rl[s]
                    wxb = wxs[li].astype(jnp.bfloat16)
                    return (
                        jnp.dot(ah, wxb,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(al, wxb,
                                  preferred_element_type=jnp.float32)
                    )
                ref = lvl_refs[li][comp]
                a = ref[0, s] if windowed[li] else ref[s]
                return jnp.dot(a, wxs[li].astype(a.dtype),
                               preferred_element_type=jnp.float32,
                               precision=prec)

            fields = []
            for comp in range(n_channels + 1):
                p_cat = jnp.concatenate(
                    [first_dot(li, comp) for li in range(n_levels)],
                    axis=0,
                )  # (sumKY, tc) f32
                if hi_lo:
                    ph = p_cat.astype(jnp.bfloat16)
                    pl_ = (p_cat - ph.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    fields.append(mxu_dot(wy, (ph, pl_)))
                else:
                    fields.append(mxu_dot(wy, p_cat))
            sw = fields[n_channels]
            ok = (sw > 1e-20) & inb & (live_ref[s] > 0.0)
            if has_stop:
                ok = ok & (t_slab_ref[s] < t_stop_ref[:])
            return fields, sw, ok

        def _interp(s):
            if yfirst:
                return _interp_yfirst(s)
            if hoist_wy:
                yp = None
            else:
                # select slab s's column via a masked reduce (Mosaic has
                # no unaligned dynamic lane indexing)
                yp = jnp.sum(
                    jnp.where(slab_ids == s, ypos_all, 0.0), axis=1)
            if fold or lattice:
                return _interp_fold(s, yp)

            # per-level y-tent weights over the tile's window; zero-pad
            # rows in the mids make out-of-range weights harmless.
            # fused: ONE (tr, KY) @ (KY, (C+1)*tc) dot per level yields
            # every channel's swv AND the mask sw (lane groups of tc);
            # else one dot per component, swv deferred to _classify.
            # concat: the per-level tents concatenate along the
            # contraction axis to match the pre-concatenated mid blocks
            if (concat or dma) and not hoist_wy:
                wys = [_wy_cat(yp)]
            else:
                per_wy = [
                    wy_refs[li][0, s] if hoist_wy else _wy(li, yp)
                    for li in range(n_levels)
                ]
                wys = ([jnp.concatenate(per_wy, axis=1)] if concat
                       else per_wy)
            acc = jnp.zeros((tr, n_comp_k * tc), jnp.float32)
            for gi in range(n_groups):
                # fused: the single group ref holds all components;
                # non-fused: contract the mask component only (swv dots
                # are deferred to _classify)
                acc = acc + mxu_dot(
                    wys[gi], _mid_block(gi, 0 if fused else n_channels, s))
            sw = acc[:, n_channels * tc:] if fused else acc
            ok = (sw > 1e-20) & inb & (live_ref[s] > 0.0)
            if has_stop:
                # surface hit caps the volume interval per pixel
                # (integrateVolume t1 = min(t1, surf t))
                ok = ok & (t_slab_ref[s] < t_stop_ref[:])
            return (acc if fused else None, wys), sw, ok

        def _slab_dense(s, carry):
            # every slab active in this tile: keep the tent build and
            # matmuls unconditional so Mosaic pipelines them across slabs
            payload, sw, ok = _interp(s)
            do = ok.any() & (jnp.max(carry[3]) > 0.005)
            return jax.lax.cond(
                do, lambda c: _classify(s, payload, sw, ok, c, 1.0),
                lambda c: c, carry,
            )

        def _slab_gated(s, carry):
            # lateral space skipping + adaptive stride: act_ref carries a
            # per-(slab, row-tile, col-tile) step weight — 0 when no
            # cell's basis support can reach the tile (skip the tent
            # build and both matmuls), k>1 when this slab stands in for a
            # group of k coarse-level slabs (the reference's per-region
            # dt = global_dt * finestLevelCellWidth, exabrick.cu:1129,
            # in slab form: coarse-only tiles take wider steps)
            w_s = act_ref[s, rt_id, ct_id]
            do = (w_s > 0.0) & (jnp.max(carry[3]) > 0.005)

            def work(carry):
                payload, sw, ok = _interp(s)
                return jax.lax.cond(
                    ok.any(),
                    lambda c: _classify(s, payload, sw, ok, c, w_s),
                    lambda c: c, carry,
                )

            return jax.lax.cond(do, work, lambda c: c, carry)

        def _classify(s, payload, sw, ok, carry, w_s):
                if fold or lattice or yfirst:
                    fields = payload
                else:
                    acc, wys = payload
                # per-slab channel merge in the reference's channel order
                # (exabrick.cu:1169-1179)
                slab_a = jnp.zeros((tr, tc), jnp.float32)
                slab_r = jnp.zeros((tr, tc), jnp.float32)
                slab_g = jnp.zeros((tr, tc), jnp.float32)
                slab_b = jnp.zeros((tr, tc), jnp.float32)
                for ch in range(n_channels):
                    if fold or lattice or yfirst:
                        swv = fields[ch]
                    elif fused:
                        swv = acc[:, ch * tc:(ch + 1) * tc]
                    else:
                        swv = jnp.zeros((tr, tc), jnp.float32)
                        for gi in range(n_groups):
                            swv = swv + mxu_dot(
                                wys[gi], _mid_block(gi, ch, s))
                    value = swv / jnp.where(sw > 1e-20, sw, 1.0)
                    if compressed:
                        lo = lut_ref[ch, 0]
                        hi = lut_ref[ch, 1]
                    else:
                        lo = lut_ref[ch, 0, 4]  # domain packed in cols 4:6
                        hi = lut_ref[ch, 0, 5]

                    sc = (n - 1) * (value - lo) / ((hi - lo) + 1e-20)
                    sc = jnp.clip(sc + 0.5, 0.0, n - 1.0) / (n - 1.0)
                    u_raw = jnp.clip(sc * n - 0.5, 0.0, n - 1.0)
                    u = jnp.where(ok, u_raw, 0.0)

                    if compressed:
                        # f(u) = base + sum_j sd_j * relu(u - p_j) over the
                        # LUT's true breakpoints (positions sorted; padding
                        # sits at n so it never fires).  Two-sided knot
                        # window: knots at or past the tile's max texel
                        # coordinate contribute nothing; knots at or below
                        # its min act affinely and fold into the prefix
                        # sums (base + u*cum1 - cum2) — only the knots
                        # inside the tile's value spread are looped.  The
                        # window bounds come from ONE vector compare +
                        # reduce over the VMEM knot-position row (a
                        # scalar fori count loop here cost ~M iterations
                        # per (slab, tile, channel); per-row-band windows
                        # were also tried and measured far slower — the
                        # per-band loop overhead dwarfs the narrower
                        # spreads, PERFORMANCE.md round-3 notes).
                        u_min = jnp.min(jnp.where(ok, u_raw, n - 1.0))
                        u_max = jnp.max(u)
                        pos_row = pos_ref[ch]  # (1, M) positions, pad = n
                        m_lo = jnp.sum(
                            (pos_row <= u_min).astype(jnp.int32))
                        m_hi = jnp.sum(
                            (pos_row < u_max).astype(jnp.int32))

                        # unrolled knot loop (knot_unroll knots per
                        # iteration): the dynamic-trip-count loop pays
                        # per-iteration scalar/branch overhead comparable
                        # to its 6-op vector body.  Over-running the
                        # window top is exact: knots at or past u_max
                        # have relu(u - p) = 0 everywhere, and d_ref
                        # carries 4 zero-contribution pad rows (pos = n).
                        uw = max(1, min(int(knot_unroll), 5))

                        def knot_u(i, accs):
                            r, g, b, a = accs
                            j0 = m_lo + i * uw
                            for o in range(uw):
                                j = j0 + o
                                ramp = jnp.maximum(
                                    u - d_ref[ch, j, 0], 0.0)
                                r = r + ramp * d_ref[ch, j, 1]
                                g = g + ramp * d_ref[ch, j, 2]
                                b = b + ramp * d_ref[ch, j, 3]
                                a = a + ramp * d_ref[ch, j, 4]
                            return (r, g, b, a)

                        base = [
                            jnp.full_like(u, lut_ref[ch, 2 + c])
                            + u * cum_ref[ch, m_lo, c]
                            - cum_ref[ch, m_lo, 4 + c]
                            for c in range(4)
                        ]
                        r, g, b, a = jax.lax.fori_loop(
                            0, (m_hi - m_lo + uw - 1) // uw,
                            knot_u, tuple(base),
                        )
                    else:
                        k_lo = jnp.clip(
                            jnp.floor(
                                jnp.min(jnp.where(ok, u, n - 1.0))
                            ).astype(jnp.int32), 0, n - 2,
                        )
                        k_hi = jnp.clip(
                            jnp.floor(jnp.max(u)).astype(jnp.int32), 0, n - 2,
                        )

                        def knot(kk, accs):
                            r, g, b, a = accs
                            ramp = jnp.clip(u - kk.astype(u.dtype), 0.0, 1.0)
                            return (
                                r + ramp * d_ref[ch, kk + 1, 0],
                                g + ramp * d_ref[ch, kk + 1, 1],
                                b + ramp * d_ref[ch, kk + 1, 2],
                                a + ramp * d_ref[ch, kk + 1, 3],
                            )

                        base = [
                            jnp.full_like(u, lut_ref[ch, k_lo, c])
                            for c in range(4)
                        ]
                        r, g, b, a = jax.lax.fori_loop(
                            k_lo, k_hi + 1, knot, tuple(base)
                        )

                    if compressed and tau[ch]:
                        # 4th component is optical depth -log(1-alpha):
                        # the exact opacity correction 1-(1-a)^dt equals
                        # 1-exp(-tau*dt) — one transcendental, not two
                        a = 1.0 - jnp.exp(
                            -jnp.maximum(a, 0.0) * ((dz * w_s) * sec)
                        )
                    else:
                        a = 1.0 - jnp.power(
                            jnp.maximum(1.0 - a, 0.0), (dz * w_s) * sec
                        )
                    a = jnp.where(ok, a, 0.0)
                    contrib = (1.0 - slab_a) * a
                    slab_r = slab_r + contrib * r
                    slab_g = slab_g + contrib * g
                    slab_b = slab_b + contrib * b
                    slab_a = slab_a + contrib

                r_acc, g_acc, b_acc, t_run = carry
                return (
                    r_acc + t_run * slab_r,
                    g_acc + t_run * slab_g,
                    b_acc + t_run * slab_b,
                    t_run * (1.0 - slab_a),
                )

        z = jnp.zeros((tr, tc), jnp.float32)
        if has_acc:
            # the pt input carries accumulated ALPHA; derive the
            # absolute transmittance in-register (out-of-bounds lanes
            # zeroed so they never keep a saturated tile alive)
            pt0 = jnp.where(inb, 1.0 - pt_ref[:], 0.0)
        elif has_pt:
            # absolute-transmittance carry (out-of-bounds lanes zeroed so
            # they never keep a saturated tile alive)
            pt0 = jnp.where(inb, pt_ref[:], 0.0)
        else:
            pt0 = jnp.ones((tr, tc), jnp.float32)
        if has_acc:
            init = (jnp.where(inb, rin_ref[:], 0.0),
                    jnp.where(inb, gin_ref[:], 0.0),
                    jnp.where(inb, bin_ref[:], 0.0), pt0)
        else:
            init = (z, z, z, pt0)
        # one branch per tile: fully-active tiles take the pipelined
        # dense loop; partially-active tiles gate per slab
        all_act = act_all_ref[rt_id, ct_id] > 0.5

        def _run_tile(c):
            return jax.lax.cond(
                all_act,
                lambda c: jax.lax.fori_loop(0, s_count, _slab_dense, c),
                lambda c: jax.lax.fori_loop(0, s_count, _slab_gated, c),
                c,
            )

        if has_pt:
            # tiles every earlier chunk saturated do nothing at all
            r, g, b, t = jax.lax.cond(
                jnp.max(pt0) > 0.005, _run_tile, lambda c: c, init
            )
        else:
            r, g, b, t = _run_tile(init)
        r_ref[:] = r
        g_ref[:] = g
        b_ref[:] = b
        # fused-accumulation mode hands ALPHA back (saturated tiles
        # pass alpha = 1 - pt0 = the input alpha through unchanged)
        t_ref[:] = (1.0 - t) if has_acc else t

    return kernel


def _pad8_rows(a: jax.Array) -> jax.Array:
    """Zero-pad the lattice-row axis — axis -2 of (S, ny, W) mids or of
    the stacked dma layout (n_ct, S, ny, tc) — to a multiple of 8
    (Mosaic sublane alignment); zero rows contribute nothing to the
    tent contraction."""
    ny = a.shape[-2]
    pad = (-ny) % 8
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[-2] = (0, pad)
    return jnp.pad(a, widths)


class ChunkPrep(NamedTuple):
    """Camera-only kernel inputs for one chunk of the megakernel lane —
    everything below depends on (grids, camera, cfg geometry) but NOT on
    the frame state, so a static pose computes it once and every
    following frame goes straight to the Pallas kernel (the analog of
    the reference's lazy BVH rebuild, exa/OptixRenderer.cpp:533-549).

    lvl: flattened per-level kernel mid blocks in the kernel's emit
    order (windowed levels (R, S, KY, Wcat); full levels (S, ny, Wcat);
    hi_lo splits each into a bf16 (hi, lo) pair).
    orgy_eff: (L, R) effective y origins (lattice origin + window start).
    acts_l: per level (S, R, Ct) bool — geometric tile activity from
    mask support (the TF/live parts are combined per frame).
    vmin/vmax: optional (C, S, R) per-row-tile blended-value bounds for
    the TF-aware lateral cull.
    y_pos_t: (H, S) slab-plane y coordinates (kernel tent input).
    wy: per level (R, S, tr, KY) hoisted y-tent weight blocks (empty
    when the kernel builds its tents in-place)."""

    lvl: tuple
    orgy_eff: jax.Array
    acts_l: tuple
    vmin: Optional[jax.Array]
    vmax: Optional[jax.Array]
    y_pos_t: jax.Array
    wy: tuple = ()
    # fold_x mode: (W, S) slab-plane x coordinates + (L,) lattice x
    # origins for the in-kernel x-tent build (None otherwise)
    xpos_t: Optional[jax.Array] = None
    orgx: Optional[jax.Array] = None
    # dma_mids mode: (L, R) int32 per-(level, row-tile) window start
    # rows (8-aligned); lvl holds UNWINDOWED f32 (S, ny8, Wp) mids and
    # the kernel DMAs its own windows (None otherwise)
    k0y: Optional[jax.Array] = None


def _dma_layout(ny_list, ky_hints):
    """Static per-level DMA-window row counts: the hint plus an 8-row
    alignment margin (window starts are rounded down to sublane
    multiples for efficient copies), capped at the level's full rows.
    Unlike _layout there is no halving gate — a DMA window is a read
    descriptor, not an HBM copy, so even a near-full window costs
    nothing extra."""
    ky_list = []
    for li, ny in enumerate(ny_list):
        ky = ny if ky_hints is None else min(int(ky_hints[li]) + 8, ny)
        ky_list.append(ky)
    return tuple(ky_list)


def _layout(ny_list, ky_hints):
    """Static per-level (KY, windowed) derivation shared by prepare and
    run: window only when it at least halves the contraction rows (near-
    full windows still stack R per-row-tile copies in HBM without
    shrinking K — measured -20% on thin-sheet grids)."""
    ky_list = []
    windowed = []
    for li, ny in enumerate(ny_list):
        ky = ny if ky_hints is None else min(int(ky_hints[li]), ny)
        win = 2 * ky <= ny
        if not win:
            ky = ny
        ky_list.append(ky)
        windowed.append(win)
    return tuple(ky_list), tuple(windowed)


def _pack_luts(luts, domains, knots, n_channels):
    """Frame-state classification tables for the kernel (SMEM packs,
    plus the knot-position rows as a VMEM array so the kernel derives
    its two-sided window with one vector compare+reduce)."""
    n = luts[0].shape[0]
    if knots is not None:
        # compressed classification: (C, 6) [domain lo, hi, base rgba] +
        # (C, M, 5) [breakpoint position, slope-delta rgba] +
        # (C, M+1, 8) prefix sums for the two-sided knot window
        kpos, ksd, kbase = knots.pos, knots.sd, knots.base
        tau_flags = knots.tau
        lut_pack = jnp.concatenate(
            [jnp.stack([jnp.asarray(d, jnp.float32) for d in domains]),
             jnp.asarray(kbase, jnp.float32)], axis=1,
        )  # (C, 6)
        d_pack = jnp.concatenate(
            [jnp.asarray(kpos, jnp.float32)[..., None],
             jnp.asarray(ksd, jnp.float32)], axis=2,
        )  # (C, M, 5)
        # 4 extra zero-contribution rows (pos=n => relu ramp is 0 for
        # every u <= n-1) so the kernel's unrolled knot loop may
        # over-run the window top by up to 3 entries
        c_n = d_pack.shape[0]
        pad = jnp.zeros((c_n, 4, 5), jnp.float32).at[:, :, 0].set(float(n))
        d_pack = jnp.concatenate([d_pack, pad], axis=1)  # (C, M+4, 5)
        cum_pack = jnp.asarray(knots.cum, jnp.float32)
        pos_pack = jnp.asarray(kpos, jnp.float32)[:, None, :]  # (C, 1, M)
    else:
        tau_flags = ()
        # pack per-channel lut + domain into one SMEM array: (C, N, 6)
        # with cols 4:6 = domain at row 0
        lut_pack = jnp.zeros((n_channels, n, 6), jnp.float32)
        d_pack = jnp.zeros((n_channels, n, 4), jnp.float32)
        for ch, (lut, dom) in enumerate(zip(luts, domains)):
            lut_pack = lut_pack.at[ch, :, :4].set(lut)
            lut_pack = lut_pack.at[ch, 0, 4].set(
                jnp.asarray(dom[0], jnp.float32)
            )
            lut_pack = lut_pack.at[ch, 0, 5].set(
                jnp.asarray(dom[1], jnp.float32)
            )
            d_pack = d_pack.at[ch].set(
                jnp.concatenate([lut[:1], lut[1:] - lut[:-1]], axis=0)
            )
        cum_pack = jnp.zeros((n_channels, 1, 8), jnp.float32)
        pos_pack = jnp.zeros((n_channels, 1, 8), jnp.float32)
    return lut_pack, d_pack, cum_pack, pos_pack, tau_flags, n


def prepare_chunk(mids: Sequence[Tuple[Sequence[jax.Array], jax.Array]],
                  origins_y, cell_widths, y_pos, height: int, width: int,
                  *, tiles=(0, 0), dot_precision: str = "highest",
                  adaptive_stride: bool = False,
                  ky_hints: Tuple[int, ...] | None = None,
                  fuse_mids: bool = True, tf_cull=None,
                  hoist_wy: bool = False,
                  concat_levels: bool = False,
                  fold_x: bool = False, x_geom=None,
                  late_x: bool = False, x_late=None,
                  dma_mids: bool = False,
                  lattice_mids: bool = False) -> ChunkPrep:
    """Build the camera-only kernel inputs for one chunk: pad/interleave
    the mids, slice per-row-tile y windows, split hi_lo pairs, derive the
    geometric tile-activity tables and the TF-cull value bounds.

    ``fold_x``: the mids are LATTICE-space z-resampled blocks
    (S, ny, nx) and the x resample happens in-kernel; ``x_geom`` must be
    ((S, W) slab-plane x coordinates, per-level lattice x origins).
    Implies per-level non-fused blocks (no interleave, no level
    concat).

    ``late_x``: the mids are LATTICE-space z-resampled blocks and the x
    resample is applied HERE, after the per-row-tile y-window slicing,
    writing the final windowed kernel blocks directly — the full-width
    (S, ny, W) mids never materialize in HBM (they cost ~W/nx x the
    lattice bytes, plus the interleave/window re-copies).  Output is
    bit-identical to the base path: slicing along non-contracted axes
    commutes with both resample einsums.  ``x_late`` must be
    (per-level x-tent entries, (S, W) x coordinates, per-level lattice
    x origins); entries are ("full", wx (S, W, nx)) or
    ("win", KX, [(k0, wx_tile (S, tcw, KX)) per column tile])."""
    n_levels = len(mids)
    n_channels = len(mids[0][0])
    hi_lo = dot_precision == "hi_lo"
    s_ = y_pos.shape[0]
    if late_x:
        if x_late is None:
            raise ValueError("late_x requires x_late")
        if fold_x:
            raise ValueError("late_x and fold_x are mutually exclusive")
        if fuse_mids:
            raise ValueError("late_x supports only non-fused mids")
        x_entries, x_pos_late, origins_x_late = x_late
    if lattice_mids:
        # fold_x's lattice blocks + dma_mids' window copies: HBM keeps
        # (S, ny, nx128) z-resampled blocks per (level, component); the
        # kernel DMAs each level's (S, KY, nx128) y-window once per row
        # tile and runs the x tents + first contraction in-kernel
        if fold_x or late_x or fuse_mids or hoist_wy:
            raise ValueError(
                "lattice_mids supports only the plain non-fused layout")
        if x_geom is None:
            raise ValueError("lattice_mids requires x_geom")
        concat_levels = False
        dma_mids = False
    if dma_mids and (fold_x or late_x or fuse_mids or hoist_wy):
        raise ValueError(
            "dma_mids supports only the plain non-fused layout")
    if fold_x:
        if x_geom is None:
            raise ValueError("fold_x requires x_geom")
        # lattice-space blocks stay per level per component: levels
        # have different lane counts (nx), and the kernel lane-fuses
        # nothing (components contract separately against shared wx);
        # the kernel builds its own tents (no hoisting)
        fuse_mids = False
        concat_levels = False
        hoist_wy = False

    mid_vs_l = [
        [_pad8_rows(mvs[ch]) for ch in range(n_channels)]
        for mvs, _ in mids
    ]
    mid_m_l = [_pad8_rows(mm) for _, mm in mids]
    if fold_x or lattice_mids:
        # lane-align the lattice x axis (Mosaic lane = 128); zero
        # columns contribute nothing to either contraction, and the
        # kernel's x-tent weights there multiply only zeros
        def _pad128(a):
            padl = (-a.shape[2]) % 128
            return a if padl == 0 else jnp.pad(
                a, ((0, 0), (0, 0), (0, padl)))

        mid_vs_l = [[_pad128(v) for v in vs] for vs in mid_vs_l]
        mid_m_l = [_pad128(m) for m in mid_m_l]
    ny_list = tuple(m.shape[-2] for m in mid_m_l)

    tr, tc = tile_shape(height, width, tiles, adaptive_stride)
    n_ct = pl.cdiv(width, tc)
    n_rt = pl.cdiv(height, tr)
    pad_c = n_ct * tc - width
    n_comp = n_channels + 1

    def _interleave(li):
        # fuse the level's channel mids + mask mid along the lane axis,
        # grouped per column tile: block j holds [v_0 | .. | v_{C-1} | m]
        # for tile j, so the kernel's y-contraction is ONE
        # (tr, KY) @ (KY, (C+1)*tc) MXU dot per level per slab
        comps = mid_vs_l[li] + [mid_m_l[li]]
        comps = [
            c_ if c_.shape[2] == n_ct * tc else jnp.pad(
                c_, ((0, 0), (0, 0), (0, n_ct * tc - c_.shape[2])))
            for c_ in comps
        ]
        ny = comps[0].shape[1]
        st = jnp.stack(
            [c_.reshape(s_, ny, n_ct, tc) for c_ in comps], axis=3
        )
        return st.reshape(s_, ny, n_ct * n_comp * tc)

    orgy = jnp.stack([jnp.asarray(o, jnp.float32) for o in origins_y])
    cws = jnp.stack([jnp.asarray(c, jnp.float32) for c in cell_widths])

    pad_r = n_rt * tr - height
    ypp = y_pos if pad_r == 0 else jnp.concatenate(
        [y_pos, jnp.repeat(y_pos[:, -1:], pad_r, axis=1)], axis=1
    )
    yt = ypp.reshape(s_, n_rt, tr)
    y_lo_t = yt.min(-1)  # (S, R)
    y_hi_t = yt.max(-1)

    k0y_arr = None
    if dma_mids or lattice_mids:
        # DMA-window mode: HBM keeps the plain f32 mids (lattice mode:
        # the z-resampled lattice blocks); only the per-(level,
        # row-tile) window START rows are computed here (8-aligned so
        # the kernel's copies land on sublane boundaries; the +8 in
        # _dma_layout covers the round-down).  No window stacks, no
        # hi_lo split pass, no interleave, no level concat — those were
        # pure HBM data movement the kernel now does as reads.
        ky_dma = _dma_layout(ny_list, ky_hints)
        orgy_eff = jnp.broadcast_to(orgy[:, None], (n_levels, n_rt))
        k0_rows = []
        for li in range(n_levels):
            ny = ny_list[li]
            ky = ky_dma[li]
            cw_v = cws[li]
            qlo_t = (y_lo_t / cw_v - orgy[li] - 0.5).min(0) - 1.0  # (R,)
            k0 = jnp.floor(qlo_t).astype(jnp.int32)
            k0 = jnp.clip((k0 // 8) * 8, 0, ny - ky)
            k0_rows.append(k0)
            orgy_eff = orgy_eff.at[li].set(
                orgy[li] + k0.astype(jnp.float32))
        k0y_arr = jnp.stack(k0_rows)  # (L, R)

        def _padw(a):
            # lattice blocks keep their own (128-padded) lane count
            if lattice_mids:
                return a
            if a.ndim == 4:
                # stacked dma layout (n_ct, S, ny, tc): the x stage
                # already wrote per-column-tile blocks with padded
                # columns exactly zero — nothing to pad or concat
                return a
            # legacy 3-D (S, ny, W) mids: pad + restack so the kernel's
            # tile-indexed DMA still works (one extra copy)
            padl = n_ct * tc - a.shape[2]
            if padl:
                a = jnp.pad(a, ((0, 0), (0, 0), (0, padl)))
            return a.reshape(
                a.shape[0], a.shape[1], n_ct, tc).transpose(2, 0, 1, 3)

        lvl_inputs = []
        for li in range(n_levels):
            for ch in range(n_channels):
                lvl_inputs.append(_padw(mid_vs_l[li][ch]))
            lvl_inputs.append(_padw(mid_m_l[li]))

    # y-windowing: slice each level's mids to the rows each row tile can
    # reach (over the whole chunk); KY static from ky_hints
    ky_list, windowed = _layout(ny_list, ky_hints)
    level_parts = []  # per level, the kernel parts in emit order
    k0_list: list = []  # per level, the window start per row tile
    if not (dma_mids or lattice_mids):
        orgy_eff = jnp.broadcast_to(orgy[:, None], (n_levels, n_rt))
    for li in (range(n_levels) if not (dma_mids or lattice_mids)
               else ()):
        ny = ny_list[li]
        ky = ky_list[li]
        win = windowed[li]
        parts: list = []
        level_parts.append(parts)

        def emit(a, win_fn=None, parts=parts):
            # hi_lo: split each mid into a bf16 (hi, lo) pair (exact
            # reconstruction to ~2^-16) feeding the two-pass kernel dot
            if hi_lo:
                ahi = a.astype(jnp.bfloat16)
                alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
                for part in (ahi, alo):
                    parts.append(
                        part if win_fn is None else win_fn(part))
            else:
                parts.append(a if win_fn is None else win_fn(a))

        if win:
            # window start per row tile: the lowest lattice row any of
            # the chunk's slabs can touch from this tile (tent reach -1)
            cw_v = cws[li]
            qlo_t = (y_lo_t / cw_v - orgy[li] - 0.5).min(0) - 1.0  # (R,)
            k0 = jnp.clip(jnp.floor(qlo_t).astype(jnp.int32), 0, ny - ky)
            k0_list.append(k0)
            orgy_eff = orgy_eff.at[li].set(
                orgy[li] + k0.astype(jnp.float32)
            )
        else:
            k0_list.append(None)
            k0 = None

        def window(a, k0=k0):
            # (S, ny, Wcat) -> (R, S, ky, Wcat) per-row-tile slices
            return jnp.stack([
                jax.lax.dynamic_slice_in_dim(a, k0[r], ky, axis=1)
                for r in range(n_rt)
            ])

        # concat mode defers windowing to the combined-buffer build
        # below (one write instead of window-stack + concatenate)
        win_fn = window if (win and not concat_levels and not late_x) else None
        if late_x:
            # window-then-resample: slice the LATTICE rows per row tile
            # (8x fewer bytes than windowing screen-width mids at
            # W >> nx), then one x-tent einsum writes the final windowed
            # block.  Exact: the window slices ride non-contracted axes
            # of both einsums.
            entry = x_entries[li]
            prec_x = {
                "high": jax.lax.Precision.HIGH,
                "highest": jax.lax.Precision.HIGHEST,
                "default": None,
                "hi_lo": jax.lax.Precision.HIGH,
            }[dot_precision]

            def xapply(a, entry=entry, prec_x=prec_x):
                spec = "rsyk,swk->rsyw" if a.ndim == 4 else "syk,swk->syw"
                if entry[0] == "full":
                    out = jnp.einsum(
                        spec, a, entry[1].astype(a.dtype),
                        preferred_element_type=jnp.float32,
                        precision=prec_x)
                else:
                    kx = entry[1]
                    out = jnp.concatenate([
                        jnp.einsum(
                            spec,
                            jax.lax.dynamic_slice_in_dim(
                                a, k0x, kx, axis=a.ndim - 1),
                            wx_t.astype(a.dtype),
                            preferred_element_type=jnp.float32,
                            precision=prec_x)
                        for k0x, wx_t in entry[2]
                    ], axis=-1)
                return out.astype(a.dtype)

            def rows_of(a, win=win, k0=k0, ky=ky):
                if not win:
                    return a
                return jnp.stack([
                    jax.lax.dynamic_slice_in_dim(a, k0[r], ky, axis=1)
                    for r in range(n_rt)
                ])

            for ch in range(n_channels):
                emit(xapply(rows_of(mid_vs_l[li][ch])))
            emit(xapply(rows_of(mid_m_l[li])))
        elif fuse_mids:
            emit(_interleave(li), win_fn=win_fn)
        else:
            for ch in range(n_channels):
                emit(mid_vs_l[li][ch], win_fn=win_fn)
            emit(mid_m_l[li], win_fn=win_fn)

    if dma_mids or lattice_mids:
        pass  # lvl_inputs already holds the plain per-level blocks
    elif concat_levels:
        # pre-concatenate the levels' blocks along the contraction axis
        # so each slab pays ONE kernel dot per component per pass
        # (small per-level K underutilizes the MXU).  Each level's
        # window is sliced straight into the combined buffer with
        # in-place dynamic-update-slices — the same write volume as the
        # unconcatenated window stacks.  Full (3-D) levels broadcast to
        # per-row-tile copies when any level is windowed — cheap,
        # because only small-ny levels stay unwindowed.
        any_win = any(windowed)
        n_parts = len(level_parts[0])
        lvl_inputs = []
        for pi in range(n_parts):
            if not any_win:
                lvl_inputs.append(jnp.concatenate(
                    [level_parts[li][pi] for li in range(n_levels)],
                    axis=1))
                continue
            if late_x:
                # late_x parts are already per-row-tile windowed
                # (R, S, ky, W); full levels broadcast their rows per
                # row tile, then one concatenate builds the combined
                # K axis
                def bc(li, pi=pi):
                    a = level_parts[li][pi]
                    if windowed[li]:
                        return a
                    return jnp.broadcast_to(
                        a[None], (n_rt,) + a.shape)

                lvl_inputs.append(jnp.concatenate(
                    [bc(li) for li in range(n_levels)], axis=2))
                continue

            def row_tile(r):
                # the level windows tile the combined K axis exactly, so
                # the whole (S, Ktot, Wcat) row-tile block materializes
                # in one concatenate over the window slices (full levels
                # repeat their rows per row tile)
                return jnp.concatenate([
                    jax.lax.dynamic_slice_in_dim(
                        level_parts[li][pi], k0_list[li][r],
                        ky_list[li], axis=1)
                    if windowed[li] else level_parts[li][pi]
                    for li in range(n_levels)
                ], axis=1)

            lvl_inputs.append(
                jnp.stack([row_tile(r) for r in range(n_rt)]))
    else:
        lvl_inputs = [p for parts in level_parts for p in parts]

    # lateral space skipping: per-(slab, row-tile, col-tile) activity
    # from mask support.  A slab's cells can only reach a tile whose y
    # range overlaps an occupied lattice point's tent support (and whose
    # columns hold non-zero x-resampled mask) — inactive tiles skip the
    # tent build and both MXU contractions in the kernel.
    lattice_occ = fold_x or late_x or lattice_mids
    if lattice_occ:
        # per-tile x windows for the lattice-space occupancy projection
        if fold_x or lattice_mids:
            x_pos_g, origins_x = x_geom
        else:
            x_pos_g, origins_x = x_pos_late, origins_x_late
        x_pos_g = jnp.asarray(x_pos_g, jnp.float32)  # (S, W)
        orgx = jnp.stack(
            [jnp.asarray(o, jnp.float32) for o in origins_x])
        xpp = x_pos_g if pad_c == 0 else jnp.concatenate(
            [x_pos_g, jnp.repeat(x_pos_g[:, -1:], pad_c, axis=1)],
            axis=1)
        xt = xpp.reshape(s_, n_ct, tc)
        x_lo_t = xt.min(-1)  # (S, Ct)
        x_hi_t = xt.max(-1)
    acts_l = []  # per level (S, R, Ct)
    for li in range(n_levels):
        ny = ny_list[li]
        if lattice_occ:
            # project the lattice mask through each tile's x window:
            # occupied iff any lattice column within tent reach of the
            # tile's x span holds mask (the analog of "non-zero
            # x-resampled mask in the tile's lanes")
            m = mid_m_l[li]  # (S, ny, nx)
            nx = m.shape[2]
            csx = jnp.cumsum(
                (m.astype(jnp.float32) > 0).astype(jnp.int32), axis=2)
            csx = jnp.concatenate(
                [jnp.zeros_like(csx[..., :1]), csx], axis=2)
            cw_v = cws[li]
            qxlo = x_lo_t / cw_v - orgx[li] - 0.5  # (S, Ct)
            qxhi = x_hi_t / cw_v - orgx[li] - 0.5
            # exact tent support: weight > 0 iff |q - k| < 1 strictly,
            # so k in [floor(qxlo), ceil(qxhi)] — floor-1/floor+2 would
            # also count the zero-weight boundary columns and perturb
            # the adaptive-stride grouping vs the lane-exact base test
            kx0 = jnp.clip(
                jnp.floor(qxlo).astype(jnp.int32), 0, nx)
            kx1 = jnp.clip(
                jnp.ceil(qxhi).astype(jnp.int32) + 1, 0, nx)
            lo_x = jnp.take_along_axis(
                csx,
                jnp.broadcast_to(kx0[:, None], (s_, ny, n_ct)), axis=2,
            )
            hi_x = jnp.take_along_axis(
                csx,
                jnp.broadcast_to(kx1[:, None], (s_, ny, n_ct)), axis=2,
            )
            occ = hi_x - lo_x > 0  # (S, ny, Ct)
        elif mid_m_l[li].ndim == 4:
            # stacked dma layout (n_ct, S, ny, tc): per-tile occupancy
            # is a reduction over the tile's own lanes
            occ = (
                mid_m_l[li].astype(jnp.float32) > 0
            ).any(-1).transpose(1, 2, 0)  # (S, ny, Ct)
        else:
            # pad from the actual lane count: kernel-produced mids
            # (slabs.py kernel_mids) arrive pre-padded to n_ct*tc
            padl = n_ct * tc - mid_m_l[li].shape[2]
            mm_p = mid_m_l[li] if padl == 0 else jnp.pad(
                mid_m_l[li], ((0, 0), (0, 0), (0, padl))
            )
            occ = (
                mm_p.reshape(s_, ny, n_ct, tc).astype(jnp.float32) > 0
            ).any(-1)  # (S, ny, Ct)
        cs = jnp.cumsum(occ.astype(jnp.int32), axis=1)
        cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
        cw_v = cws[li]
        qlo = y_lo_t / cw_v - orgy[li] - 0.5  # (S, R)
        qhi = y_hi_t / cw_v - orgy[li] - 0.5
        k0 = jnp.clip(jnp.floor(qlo).astype(jnp.int32) - 1, 0, ny)
        k1 = jnp.clip(jnp.floor(qhi).astype(jnp.int32) + 2, 0, ny)
        lo_g = jnp.take_along_axis(
            cs, jnp.broadcast_to(k0[:, :, None], (s_, n_rt, n_ct)), axis=1
        )
        hi_g = jnp.take_along_axis(
            cs, jnp.broadcast_to(k1[:, :, None], (s_, n_rt, n_ct)), axis=1
        )
        acts_l.append(hi_g - lo_g > 0)

    vmin_all = vmax_all = None
    if tf_cull is not None:
        # TF-aware lateral cull bounds: the blended value at any point is
        # a convex combination of contributing cell values, so the
        # combined min/max over all levels' support rows bounds it (the
        # lateral analog of the TF-culled BVH bounds program,
        # exabrick.cu:283-331).  The LUT walk happens per frame in
        # combine_activity; these bounds are camera-only.
        vr_rows, y_bins = tf_cull
        vmin_all = jnp.full((n_channels, s_, n_rt), jnp.inf)
        vmax_all = jnp.full((n_channels, s_, n_rt), -jnp.inf)
        for li in range(n_levels):
            vr_s = vr_rows[li]  # (C, S, nyb, 2)
            nyb = vr_s.shape[2]
            bin_ = float(y_bins[li])
            # y-bins whose cells' tent support intersects the tile rows
            qlo = y_lo_t / cws[li] - orgy[li] - 0.5 - 1.0  # (S, R)
            qhi = y_hi_t / cws[li] - orgy[li] - 0.5 + 1.0
            b0 = jnp.floor(qlo / bin_)
            b1 = jnp.floor(qhi / bin_)
            bidx = jnp.arange(nyb, dtype=jnp.float32)
            inr = (bidx[None, None] >= b0[..., None]) & (
                bidx[None, None] <= b1[..., None]
            )  # (S, R, nyb)
            vmin_all = jnp.minimum(vmin_all, jnp.where(
                inr[None], vr_s[:, :, None, :, 0], jnp.inf).min(-1))
            vmax_all = jnp.maximum(vmax_all, jnp.where(
                inr[None], vr_s[:, :, None, :, 1], -jnp.inf).max(-1))

    wy_blocks = ()
    if hoist_wy:
        # hoisted per-(row-tile, slab) y-tent weights: built once here
        # (camera-only) instead of once per (slab, column tile) in the
        # kernel.  Arithmetic mirrors the kernel's _wy exactly (f32
        # build, cast to the dot's input dtype), so output is
        # bit-identical either way.
        wdt = (jnp.bfloat16 if dot_precision in ("hi_lo", "default")
               else jnp.float32)
        ypt = ypp.reshape(s_, n_rt, tr).transpose(1, 0, 2)  # (R, S, tr)
        blocks = []
        for li in range(n_levels):
            ky = ky_list[li]
            qy = (ypt / cws[li]
                  - orgy_eff[li][:, None, None] - 0.5)  # (R, S, tr)
            kk = jnp.arange(ky, dtype=jnp.float32)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(qy[..., None] - kk))
            blocks.append(wy.astype(wdt))
        wy_blocks = tuple(blocks)

    return ChunkPrep(
        lvl=tuple(lvl_inputs), orgy_eff=orgy_eff, acts_l=tuple(acts_l),
        vmin=vmin_all, vmax=vmax_all, y_pos_t=y_pos.T, wy=wy_blocks,
        xpos_t=(xpp.T if (fold_x or lattice_mids) else None),
        orgx=(orgx if (fold_x or lattice_mids) else None),
        k0y=k0y_arr,
    )


def combine_activity(prep: ChunkPrep, live, luts, domains, cell_widths,
                     *, adaptive_stride: bool = False):
    """Per-frame (TF/live-dependent) activity tables from the cached
    geometric ones: OR the per-level activities, mask dead slabs, apply
    the TF-aware lateral cull, then form adaptive-stride step weights.
    All arrays here are (S, R, Ct)-sized — negligible next to the
    kernel."""
    acts_l = prep.acts_l
    s_, n_rt, n_ct = acts_l[0].shape
    cws = jnp.stack([jnp.asarray(c, jnp.float32) for c in cell_widths])
    act = jnp.zeros((s_, n_rt, n_ct), bool)
    for al in acts_l:
        act = act | al
    act = act & live[:, None, None]

    if prep.vmin is not None:
        from .xf import active_for_volume_sampling

        n_channels = prep.vmin.shape[0]
        act_tf = jnp.zeros((s_, n_rt), bool)
        for ch in range(n_channels):
            rng = jnp.stack([prep.vmin[ch], prep.vmax[ch]], -1)
            a = active_for_volume_sampling(luts[ch], domains[ch], 1.0, rng)
            act_tf = act_tf | (a & (prep.vmax[ch] >= prep.vmin[ch]))
        act = act & act_tf[:, :, None]

    act_f = act.astype(jnp.float32)
    if adaptive_stride and s_ > 1:
        # Adaptive z-stride (the slab form of the reference's per-region
        # dt = global_dt * finestLevelCellWidth, exabrick.cu:1129): where
        # a tile's finest contributing level is coarse, one
        # representative slab stands in for a group of up to 8 with its
        # step weight scaled by the group's active count.  Groups are
        # formed greedily (8, then 4, then 2 consecutive slabs) and only
        # where every group member admits the stride — the quadrature
        # then matches what the reference's marcher does in coarse
        # regions.
        cw_act = jnp.full((s_, n_rt, n_ct), jnp.inf)
        for li, al in enumerate(acts_l):
            cw_act = jnp.minimum(cw_act, jnp.where(al, cws[li], jnp.inf))
        # stride limit = local finest cw / global finest cw: slab spacing
        # scales by the same level ratio the reference's per-region dt
        # does, preserving the user's dt choice (dz may oversample)
        lim = jnp.where(act, cw_act / jnp.min(cws), jnp.inf)
        weight = act.astype(jnp.float32)
        consumed = jnp.zeros((s_, n_rt, n_ct), bool)
        for c_val in (8, 4, 2):
            if c_val > s_:
                continue
            gpad = (-s_) % c_val

            def padded(x, fill):
                if not gpad:
                    return x
                return jnp.concatenate(
                    [x, jnp.full((gpad,) + x.shape[1:], fill, x.dtype)]
                )

            gl = padded(lim, jnp.inf).reshape(-1, c_val, n_rt, n_ct)
            ga = padded(act, False).reshape(-1, c_val, n_rt, n_ct)
            gc = padded(consumed, False).reshape(-1, c_val, n_rt, n_ct)
            feas = (
                (gl.min(1) >= c_val)
                & (ga.sum(1) >= 2)
                & ~gc.any(1)
            )  # (G, R, Ct)
            # representative = active slab nearest the active span middle
            li_ = jnp.arange(c_val, dtype=jnp.float32)[None, :, None, None]
            first = jnp.where(ga, li_, float(c_val)).min(1)
            last = jnp.where(ga, li_, -1.0).max(1)
            mid = 0.5 * (first + last)
            score = jnp.abs(li_ - mid[:, None]) + jnp.where(ga, 0.0, 1e9)
            rep = jnp.argmin(score, axis=1)  # (G, R, Ct)
            is_rep = li_.astype(jnp.int32) == rep[:, None]
            cnt = ga.sum(1).astype(jnp.float32)[:, None]
            w_g = jnp.where(is_rep & ga, cnt, 0.0)
            apply = feas[:, None] & ga
            gw = padded(weight, jnp.float32(0)).reshape(
                -1, c_val, n_rt, n_ct
            )
            gw = jnp.where(apply, w_g, gw)
            gcon = jnp.where(feas[:, None], True, gc)
            weight = gw.reshape(-1, n_rt, n_ct)[:s_]
            consumed = gcon.reshape(-1, n_rt, n_ct)[:s_]
        act_f = weight
    # per-tile "every slab active at unit weight" selects the pipelined
    # dense loop
    act_all_f = (
        act.all(axis=0) & (jnp.abs(act_f - 1.0) < 0.5).all(axis=0)
    ).astype(jnp.float32)  # (R, Ct)
    return act_f, act_all_f


def run_chunk(prep: ChunkPrep, sec, live, luts, domains, dz,
              height: int, width: int, *, act_f, act_all_f,
              cell_widths, n_channels: int, knots=None, t_stop=None,
              tiles=(0, 0), dot_precision: str = "highest",
              adaptive_stride: bool = False, prev_trans=None,
              fuse_mids: bool = True, concat_levels: bool = False,
              ky_list=None, interpret: bool | None = None,
              knot_unroll: int = 4, yfirst: bool = False,
              accum=None):
    """Dispatch the megakernel for one chunk from prepared inputs.
    Static layout (KY, windowed, level count) is inferred from the
    prepared block shapes; ``concat_levels`` preps carry one combined
    block per part, so the per-level ``ky_list`` (the static y-window
    row counts prepare_chunk derived) must be passed explicitly.

    accum: optional (color (3, H, W), alpha (H, W)) accumulated by the
    earlier chunks.  When given (supersedes ``prev_trans``), the kernel
    fuses the framebuffer accumulation: the compositing carry starts
    from the accumulated rgb, the alpha input replaces the
    transmittance image, and the returns are (total rgb, total ALPHA)
    — the caller assigns instead of adding, and the per-chunk
    ``color + chunk_rgb`` / ``1 - trans`` XLA fusions (plus the
    chunk_rgb intermediate) never touch HBM (~80 MB/chunk at 1080p)."""
    hi_lo = dot_precision == "hi_lo"
    fold = prep.xpos_t is not None
    dma = prep.k0y is not None
    lattice = fold and dma  # lattice_mids preps carry xpos AND k0y
    nx_list = ()
    if lattice:
        fold = False
        dma = False
        fuse_mids = False
        concat_levels = False
        if ky_list is None:
            raise ValueError("lattice_mids requires the static ky_list "
                             "(_dma_layout)")
        if len(prep.wy) > 0:
            raise ValueError("lattice_mids is incompatible with "
                             "hoisted tents")
        per_lvl = n_channels + 1
        n_levels = len(prep.lvl) // per_lvl
        nx_list = tuple(
            int(prep.lvl[li * per_lvl].shape[2])
            for li in range(n_levels)
        )
    elif fold:
        fuse_mids = False
        concat_levels = False
        if len(prep.wy) > 0:
            raise ValueError("fold mode is incompatible with hoisted "
                             "tents (the kernel builds its own tents)")
    if dma:
        fuse_mids = False
        concat_levels = False
        if ky_list is None:
            raise ValueError("dma_mids requires the static ky_list "
                             "(_dma_layout)")
        if len(prep.wy) > 0:
            raise ValueError("dma_mids is incompatible with hoisted "
                             "tents")
        per_lvl = n_channels + 1
        n_levels = len(prep.lvl) // per_lvl
    elif not lattice:
        per_lvl = ((n_channels + 1) if not fuse_mids else 1) * (
            2 if hi_lo else 1)
        if concat_levels:
            if ky_list is None:
                raise ValueError(
                    "concat_levels requires the static ky_list")
            n_levels = len(ky_list)
        else:
            n_levels = len(prep.lvl) // per_lvl
    s_ = prep.y_pos_t.shape[1]

    lut_pack, d_pack, cum_pack, pos_pack, tau_flags, n = _pack_luts(
        luts, domains, knots, n_channels)
    params = jnp.stack(
        [jnp.asarray(dz, jnp.float32),
         jnp.asarray(height, jnp.float32),
         jnp.asarray(width, jnp.float32)]
    )
    cws = jnp.stack([jnp.asarray(c, jnp.float32) for c in cell_widths])

    tr, tc = tile_shape(height, width, tiles, adaptive_stride)
    hoist = len(prep.wy) > 0
    # hoisted tents and fold mode flip the grid to rows-outer so the
    # per-row-tile blocks (tent blocks / lattice mids, index-invariant
    # along the column sweep) load once per row tile instead of once
    # per step
    if hoist or fold or dma or lattice:
        grid = (pl.cdiv(height, tr), pl.cdiv(width, tc))

        def imap_win(i, j):
            return (i, 0, 0, 0) if fold else (i, 0, 0, j)

        def imap_full(i, j):
            return (0, 0, 0) if fold else (0, 0, j)

        def imap_ypos(i, j):
            return (i, 0)

        def imap_xpos(i, j):
            return (j, 0)

        def imap_tile(i, j):
            return (i, j)

        def imap_wy(i, j):
            return (i, 0, 0, 0)
    else:
        grid = (pl.cdiv(width, tc), pl.cdiv(height, tr))

        def imap_win(j, i):
            return (i, 0, 0, j)

        def imap_full(j, i):
            return (0, 0, j)

        def imap_ypos(j, i):
            return (i, 0)

        def imap_tile(j, i):
            return (i, j)

    n_comp = n_channels + 1
    wcat = (n_comp * tc) if fuse_mids else tc

    # rebuild static layout + block specs from the prepared shapes
    lvl_specs = []
    if lattice:
        # lattice blocks stay in HBM; the kernel issues its own
        # (S, KY, nx) y-window copies once per row tile
        ky_list = tuple(int(k) for k in ky_list)
        windowed = (True,) * n_levels
        lvl_specs.extend(
            [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
            * (n_levels * per_lvl))
    elif dma:
        # unwindowed mids stay in HBM; the kernel issues its own window
        # copies (dynamic row offsets from prep.k0y)
        ky_list = tuple(int(k) for k in ky_list)
        windowed = (True,) * n_levels
        lvl_specs.extend(
            [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
            * (n_levels * per_lvl))
    elif concat_levels:
        # one combined block per part: K = sum of the per-level KYs
        ky_list = tuple(int(k) for k in ky_list)
        blk = prep.lvl[0]
        win = blk.ndim == 4
        ktot = blk.shape[2] if win else blk.shape[1]
        if ktot != sum(ky_list):
            raise ValueError(
                f"concat block K={ktot} != sum(ky_list)={sum(ky_list)}")
        windowed = (win,)
        if win:
            spec = pl.BlockSpec((1, s_, ktot, wcat), imap_win,
                                memory_space=pltpu.VMEM)
        else:
            spec = pl.BlockSpec((s_, ktot, wcat), imap_full,
                                memory_space=pltpu.VMEM)
        lvl_specs.extend([spec] * per_lvl)
    else:
        ky_list = []
        windowed = []
        nx_list = []
        for li in range(n_levels):
            blk = prep.lvl[li * per_lvl]
            win = blk.ndim == 4
            ky = blk.shape[2] if win else blk.shape[1]
            ky_list.append(ky)
            windowed.append(win)
            # fold mode: lattice-space blocks carry the level's own lane
            # count (nx, 128-padded by prepare_chunk) and are column-tile
            # invariant (whole-lane blocks, loaded once per row tile)
            lane = blk.shape[-1] if fold else wcat
            if fold:
                nx_list.append(lane)
            if win:
                spec = pl.BlockSpec((1, s_, ky, lane), imap_win,
                                    memory_space=pltpu.VMEM)
            else:
                spec = pl.BlockSpec((s_, ky, lane), imap_full,
                                    memory_space=pltpu.VMEM)
            lvl_specs.extend([spec] * per_lvl)
    wy_specs = [
        pl.BlockSpec((1, s_, tr, prep.wy[li].shape[3]), imap_wy,
                     memory_space=pltpu.VMEM)
        for li in range(n_levels)
    ] if hoist else []

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile2 = pl.BlockSpec((tr, tc), imap_tile, memory_space=pltpu.VMEM)
    pt_ins = []
    pt_specs = []
    acc_ins = []
    acc_specs = []
    if accum is not None:
        color_in, alpha_in = accum
        pt_ins = [jnp.asarray(alpha_in, jnp.float32)]
        pt_specs = [tile2]
        acc_ins = [jnp.asarray(color_in[c], jnp.float32)
                   for c in range(3)]
        acc_specs = [tile2, tile2, tile2]
    elif prev_trans is not None:
        pt_ins = [jnp.asarray(prev_trans, jnp.float32)]
        pt_specs = [tile2]
    stop_ins = []
    stop_specs = []
    if t_stop is not None:
        t_slab, t_stop_img = t_stop
        stop_ins = [jnp.asarray(t_slab, jnp.float32),
                    jnp.asarray(t_stop_img, jnp.float32)]
        stop_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), None]

    orgx_in = (prep.orgx if (fold or lattice)
               else jnp.zeros((len(cell_widths),), jnp.float32))
    xpos_ins = []
    xpos_specs = []
    if fold or lattice:
        xpos_ins = [prep.xpos_t]
        xpos_specs = [pl.BlockSpec((tc, s_), imap_xpos,
                                   memory_space=pltpu.VMEM)]
    k0y_ins = []
    k0y_specs = []
    scratch_shapes = []
    if dma:
        k0y_ins = [prep.k0y]
        k0y_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        ktot_dma = sum(ky_list)
        scratch_shapes = [
            pltpu.VMEM((2, s_, ktot_dma, tc), prep.lvl[0].dtype)
            for _ in range(n_channels + 1)
        ] + [pltpu.SemaphoreType.DMA((2, n_channels + 1, n_levels))]
    elif lattice:
        # per-(component, level) scratch: levels keep their own lane
        # counts (nx128), so no cross-level concatenation here — the
        # first (x) contraction is per level anyway
        k0y_ins = [prep.k0y]
        k0y_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        scratch_shapes = [
            pltpu.VMEM((2, s_, ky_list[li], nx_list[li]),
                       prep.lvl[0].dtype)
            for _ in range(n_channels + 1)
            for li in range(n_levels)
        ] + [pltpu.SemaphoreType.DMA((2, n_channels + 1, n_levels))]
        if yfirst:
            # T1 scratch per (comp, level): (S, tr, nx128) f32, filled
            # once per row tile and reused across the column sweep
            scratch_shapes += [
                pltpu.VMEM((s_, tr, nx_list[li]), jnp.float32)
                for _ in range(n_channels + 1)
                for li in range(n_levels)
            ]

    # Lattice mode keeps whole (S, KY, nx) level blocks double-buffered
    # in scratch plus per-slab x-tent/p_cat temps, which overflows
    # Mosaic's default 16 MB scoped-vmem stack at useful chunk depths
    # (measured 18.1 MB at 9 slabs / 256^3).  v5e/v5p carry 128 MB of
    # VMEM; raise the scoped limit for this layout rather than starving
    # the chunk (shallow chunks re-pay the fixed per-launch cost).
    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024
                             if yfirst else 64 * 1024 * 1024)
        if lattice else None
    )
    if dma and compiler_params is None:
        # the dma window scratch (2 slots x S x sum(KY) x tc x f32 per
        # component) can outgrow Mosaic's default 16 MB scoped stack
        # when the chunk budget is raised (SlabConfig.chunk_budget_mb) —
        # deep chunks at reference scale.  The chip has 128 MB of VMEM.
        scr_bytes = 2 * s_ * sum(ky_list) * tc * 4 * (n_channels + 1)
        if scr_bytes > 12 * 1024 * 1024:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024)
    r, g, b, t = pl.pallas_call(
        _make_kernel(n_levels, tuple(ky_list), tuple(windowed), n_channels,
                     n_texels=n if knots is not None else 0,
                     has_stop=t_stop is not None,
                     dot_precision=dot_precision,
                     tau=tau_flags,
                     has_pt=(prev_trans is not None or accum is not None),
                     has_acc=accum is not None,
                     fused=fuse_mids, hoist_wy=hoist,
                     concat=concat_levels,
                     static_cws=(tuple(float(c) for c in cell_widths)
                                 if (concat_levels or fold or dma
                                     or lattice)
                                 else ()),
                     fold=fold,
                     nx_list=(tuple(nx_list) if (fold or lattice)
                              else ()),
                     knot_unroll=knot_unroll,
                     dma=dma,
                     lattice=lattice,
                     yfirst=yfirst,
                     grid_rc=((pl.cdiv(height, tr), pl.cdiv(width, tc))
                              if (dma or lattice) else (0, 0)),
                     dma_sync=bool(int(
                         os.environ.get("OWLEXA_DMA_SYNC", "0")))),
        grid=grid,
        scratch_shapes=scratch_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lut pack
            pl.BlockSpec(memory_space=pltpu.SMEM),  # d pack
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cum prefix
            pl.BlockSpec(memory_space=pltpu.VMEM),  # knot positions
            pl.BlockSpec(memory_space=pltpu.SMEM),  # live
            pl.BlockSpec(memory_space=pltpu.SMEM),  # act table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # act-all per tile
            pl.BlockSpec(memory_space=pltpu.SMEM),  # orgy eff (L, R)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cw
            pl.BlockSpec(memory_space=pltpu.SMEM),  # orgx (fold)
            *k0y_specs,
            *lvl_specs,
            *wy_specs,
            pl.BlockSpec((tr, s_), imap_ypos, memory_space=pltpu.VMEM),
            *xpos_specs,
            tile2,
            *pt_specs,
            *acc_specs,
            *([stop_specs[0], tile2] if stop_ins else []),
        ],
        out_specs=(tile2, tile2, tile2, tile2),
        compiler_params=compiler_params,
        out_shape=tuple(
            jax.ShapeDtypeStruct((height, width), jnp.float32)
            for _ in range(4)
        ),
        interpret=interpret,
    )(params, lut_pack, d_pack, cum_pack, pos_pack,
      live.astype(jnp.float32), act_f, act_all_f, prep.orgy_eff, cws,
      orgx_in, *k0y_ins, *prep.lvl, *prep.wy, prep.y_pos_t, *xpos_ins,
      sec, *pt_ins, *acc_ins, *stop_ins)
    return jnp.stack([r, g, b]), t


def sweep_chunk(mids: Sequence[Tuple[Sequence[jax.Array], jax.Array]],
                origins_y, cell_widths, y_pos, sec, live,
                luts, domains, dz, height: int, width: int, *,
                knots=None, tf_cull=None, t_stop=None, tiles=(0, 0),
                dot_precision: str = "highest",
                adaptive_stride: bool = False,
                ky_hints: Tuple[int, ...] | None = None,
                prev_trans=None,
                fuse_mids: bool = True,
                hoist_wy: bool = False,
                concat_levels: bool = False,
                fold_x: bool = False, x_geom=None,
                late_x: bool = False, x_late=None,
                dma_mids: bool = False,
                lattice_mids: bool = False,
                yfirst: bool = False,
                interpret: bool | None = None,
                knot_unroll: int = 4,
                accum=None):
    """Run the sweep megakernel for one chunk (prepare + combine + run).

    mids: per level ([mid_v per channel (S, ny, W)], mid_m (S, ny, W)) —
    x-resampled, z-lerped level slabs; origins_y / cell_widths: per-level
    scalars; y_pos: (S, H) slab-plane y coordinates; sec: (H, W);
    live: (S,); luts: per channel (N, 4) alpha-prescaled; domains: per
    channel (2,).  ky_hints: static per-level y-window row counts
    (multiples of 8, from the host camera — see ky_hints_for_camera);
    None = full rows.  Returns (rgb (3,H,W), trans (H,W)).

    prev_trans: optional (H, W) transmittance accumulated by earlier
    chunks.  When given, the kernel carries *absolute* transmittance:
    outputs are premultiplied (caller composites ``color += rgb;
    alpha = 1 - trans``) and tiles/pixels the earlier chunks saturated
    skip their slab work entirely — the per-tile form of the
    reference's terminateRay (exabrick.cu:1694-97; identical up to the
    <=0.005-transmittance tail, which the saturated-pixel collapse
    absorbs).
    """
    n_channels = len(luts)
    prep = prepare_chunk(
        mids, origins_y, cell_widths, y_pos, height, width,
        tiles=tiles, dot_precision=dot_precision,
        adaptive_stride=adaptive_stride, ky_hints=ky_hints,
        fuse_mids=fuse_mids, tf_cull=tf_cull, hoist_wy=hoist_wy,
        concat_levels=concat_levels, fold_x=fold_x, x_geom=x_geom,
        late_x=late_x, x_late=x_late, dma_mids=dma_mids,
        lattice_mids=lattice_mids or yfirst,
    )
    act_f, act_all_f = combine_activity(
        prep, live, luts, domains, cell_widths,
        adaptive_stride=adaptive_stride,
    )
    ky_list = None
    if dma_mids or lattice_mids or yfirst:
        # dma mids may arrive as the stacked (n_ct, S, ny, tc) layout;
        # the lattice-row axis is -2 in both layouts
        ny_list = tuple(-(-m.shape[-2] // 8) * 8 for _, m in mids)
        ky_list = _dma_layout(ny_list, ky_hints)
    elif concat_levels:
        ny_list = tuple(-(-m.shape[1] // 8) * 8 for _, m in mids)
        ky_list, _ = _layout(ny_list, ky_hints)
    return run_chunk(
        prep, sec, live, luts, domains, dz, height, width,
        act_f=act_f, act_all_f=act_all_f, cell_widths=cell_widths,
        n_channels=n_channels, knots=knots, t_stop=t_stop, tiles=tiles,
        dot_precision=dot_precision, adaptive_stride=adaptive_stride,
        prev_trans=prev_trans, fuse_mids=fuse_mids,
        concat_levels=concat_levels, ky_list=ky_list, interpret=interpret,
        knot_unroll=knot_unroll, yfirst=yfirst, accum=accum,
    )
