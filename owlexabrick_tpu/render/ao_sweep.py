"""Sweep-based ambient occlusion for the slab fast path.

The reference's AO (exabrick.cu:1612-1645) shoots 2 cosine-distributed
hemisphere rays per pixel per frame against the surfaces and averages
hit counts progressively.  Per-pixel incoherent rays are the worst case
for a TPU (see PERFORMANCE.md's gather wall), so the fast path restates
the same Monte-Carlo integral over a per-frame direction pool:

  * per frame, ``RenderConfig.ao_dirs`` uniform-sphere directions are
    drawn (re-drawn per frame by the accumulation RNG) and a signed
    shadow volume is built for each: S_d(x) = 1 iff the iso indicator
    is occupied within ao_length along d from x — a directional
    dilation of the indicator, built with log2(K) shift-OR doubling
    passes over a dense finest-lattice grid (rolls + masks, no
    gathers); this cost scales with the pool size, not the pixel count;
  * each pixel draws ``ao_samples`` pool members with probability
    proportional to |cos(n, u_j)| and importance weight
    2|cos_j| / (D p_j): unbiased for the cosine-weighted hemisphere
    integral, the weight concentrates near E[2|cos|] = 1 (the
    reference's cosine-importance variance profile), and neighbouring
    pixels decorrelate within one frame — tested statistically in
    tests/test_ao_sweep.py.

The occluders are the iso level sets (marked on the lattice where a
cell neighborhood's field range crosses an enabled iso).  Scenes with
meshes or streamlines stay on the fast path too: geometric occlusion is
evaluated as dense prim intersections along the same pool directions
(``geom_occluder`` in :func:`ao_shadow_fast`), combined with the lattice
shadow under one estimator (``ao_combined`` in
render/renderer.py:_render_fast).  The packed wavefront path retains the
reference's per-pixel cosine draws for oracle comparisons.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def build_ao_lattice(grids_host):
    """Host-side (once per scene): the basis field and occupancy at the
    finest-lattice cell centers over the sweep bounds, (nz, ny, nx) in
    the grid (z, y, x) frame.  Returns (val, occ, lo (3,), cwf)."""
    finest = min(grids_host.levels)
    cwf = float(1 << finest)
    lo = np.asarray(grids_host.bounds_lo, np.float64)
    hi = np.asarray(grids_host.bounds_hi, np.float64)
    dims = [int(np.ceil((hi[a] - lo[a]) / cwf)) for a in range(3)]

    coords = [
        (lo[a] + cwf * (0.5 + np.arange(dims[a]))).astype(np.float64)
        for a in range(3)
    ]
    sw = np.zeros(dims, np.float32)
    swv = np.zeros(dims, np.float32)
    for li, L in enumerate(grids_host.levels):
        cw = float(1 << L)
        m = np.asarray(grids_host.masks[li])
        v = np.asarray(grids_host.vals[li][0])
        org = np.asarray(grids_host.origins[li], np.float64)
        mats = []
        for a, n_l in zip(range(3), m.shape):
            q = coords[a] / cw - org[a] - 0.5
            k = np.arange(n_l)
            mats.append(
                np.maximum(0.0, 1.0 - np.abs(q[:, None] - k[None]))
                .astype(np.float32)
            )

        def resample(vol):
            t = np.einsum("zi,iyx->zyx", mats[0], vol, optimize=True)
            t = np.einsum("yj,zjx->zyx", mats[1], t, optimize=True)
            return np.einsum("xk,zyk->zyx", mats[2], t, optimize=True)

        sw += resample(m)
        swv += resample(v)
    occ = sw > 1e-20
    val = np.where(occ, swv / np.where(occ, sw, 1.0), 0.0)
    return (val.astype(np.float32), occ,
            np.asarray(grids_host.bounds_lo, np.float32), cwf)


def iso_indicator(val, occ, fs):
    """(nz, ny, nx) f32 0/1: an enabled iso value crosses between this
    cell's center and a face neighbor's (device, cheap — recomputed on
    iso edits).  Kept one cell thin: a thickened indicator would
    self-occlude every surface point (the dominant error mode of
    volumetric AO)."""
    ind = jnp.zeros(val.shape, bool)
    for ax in range(3):
        n = val.shape[ax]
        idx = jnp.arange(n)
        for s in (1, -1):
            nb_v = jnp.roll(val, s, ax)
            nb_o = jnp.roll(occ, s, ax)
            # jnp.roll wraps: mask the pair that compared across the
            # opposite boundary
            edge_ok = (idx >= s) if s > 0 else (idx < n + s)
            shape = [1, 1, 1]
            shape[ax] = n
            pair = occ & nb_o & edge_ok.reshape(shape)
            for k in range(fs.iso_enabled.shape[0]):
                iso = fs.iso_value[k]
                ind = ind | (
                    fs.iso_enabled[k] & pair
                    & ((val - iso) * (nb_v - iso) <= 0.0)
                )
    return ind.astype(jnp.float32)


def _shift_along(vol, off):
    """vol(x) -> vol(x + off) with zero fill; ``off`` is a traced (3,)
    int32 lattice offset."""
    out = vol
    for ax in range(3):
        o = off[ax]
        n = out.shape[ax]
        out = jnp.roll(out, -o, axis=ax)
        idx = jnp.arange(n)
        valid = jnp.where(o >= 0, idx < n - o, idx >= -o)
        shape = [1, 1, 1]
        shape[ax] = n
        out = out * valid.reshape(shape).astype(out.dtype)
    return out


def shadow_volume(ind, d, ao_len_cells, max_len_cells: int):
    """S_d(x): ``ind`` occupied within ``ao_len_cells`` along the unit
    direction ``d`` (both traced) from x.  Doubling construction with a
    static pass bound of ceil(log2(max_len_cells))."""
    steps = jnp.maximum(jnp.ceil(ao_len_cells), 1.0)
    reach = _shift_along(ind, jnp.round(d).astype(jnp.int32))
    n_pass = max(int(np.ceil(np.log2(max(max_len_cells, 2)))), 1)
    span = jnp.float32(1.0)
    for _ in range(n_pass):
        adv = jnp.minimum(span, jnp.maximum(steps - span, 0.0))
        off = jnp.round(d * adv).astype(jnp.int32)
        shifted = _shift_along(reach, off)
        # adv==0 -> no-op (off 0 shifts nothing, max keeps reach)
        reach = jnp.maximum(reach, shifted)
        span = span + adv
    return reach


def sample_lattice(vol, lo, cwf, pts_zyx):
    """Trilinear sample of a dense (nz, ny, nx) volume at (P, 3) points
    in the grid (z, y, x) frame — one gather row per corner per pixel,
    used once per frame at the surface hits."""
    return sample_lattice_indexed(
        vol[None], lo, cwf, pts_zyx,
        jnp.zeros(pts_zyx.shape[0], jnp.int32),
    )


def sample_lattice_indexed(vols, lo, cwf, pts_zyx, vidx):
    """Trilinear sample of a stacked (V, nz, ny, nx) volume at (P, 3)
    grid-frame points, volume ``vidx`` (P,) per point — one gather row
    per corner per pixel.  The stack axis stays a separate index (not
    folded into a flat int32 offset) so the reach is the same ~2^31
    cells per volume regardless of the stack size."""
    _, nz, ny, nx = vols.shape
    q = (pts_zyx - lo[None, :]) / cwf - 0.5
    k0 = jnp.floor(q).astype(jnp.int32)
    f = q - k0.astype(q.dtype)
    flat = vols.reshape(vols.shape[0], -1)
    acc = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                kz = jnp.clip(k0[:, 0] + dz, 0, nz - 1)
                ky = jnp.clip(k0[:, 1] + dy, 0, ny - 1)
                kx = jnp.clip(k0[:, 2] + dx, 0, nx - 1)
                w = (
                    (f[:, 0] if dz else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dx else 1 - f[:, 2])
                )
                corner = flat[vidx, (kz * ny + ky) * nx + kx]
                acc = acc + w * corner.astype(jnp.float32)
    return acc


def ao_shadow_fast(lattice, fs, hit_zyx, normals_zyx, key,
                   ao_samples: int = 2, geom_occluder=None,
                   ao_dirs: int = 4):
    """Per-pixel AO shadow estimate at surface hits.

    lattice: (val, occ, lo, cwf) device arrays from build_ao_lattice.
    hit_zyx: (P, 3) surface points, normals_zyx: (P, 3) unit normals,
    both in the grid (z, y, x) frame.  Returns (P,) shadow in [0, 1] —
    the frame's term of the progressive average (hits/ao_samples).

    Estimator: ``ao_dirs`` uniform-sphere directions are drawn per frame
    and their signed shadow volumes built once (cost scales with D, not
    with pixels); each pixel then draws ``ao_samples`` directions from
    the pool with probability proportional to |cos(n, u_j)| and weights
    the hit by 2|cos_j| / (D p_j) = 2 sum_k(|cos_k|) / D.  Conditional
    on the pool this is an unbiased estimate of the pool average
    (1/D) sum_j hit_j 2|cos_j|, whose expectation over the pool is the
    reference's cosine-weighted hemisphere integral
    (exabrick.cu:1612-1645) — and the weight concentrates near
    E[2|cos|] = 1, so the per-pixel variance approaches the reference's
    cosine-importance estimator while neighbouring pixels decorrelate
    within a single frame.  The pool never shrinks below ``ao_samples``
    (a smaller pool would make a pixel's samples share directions,
    strictly worse coverage than one independent draw per sample).

    ``geom_occluder``: optional callback ``d_pix (P, 3) zyx -> (P,)
    0/1`` reporting geometric occlusion (meshes/streamlines) along the
    per-pixel hemisphere direction — OR-ed with the lattice's iso
    occlusion under the same estimator, so mesh AO with iso occluders
    shares one sample budget."""
    val, occ, lo, cwf = lattice
    ind = iso_indicator(val, occ, fs)
    max_len = max(val.shape)
    ao_cells = jnp.clip(fs.ao_length / cwf, 1.0, float(max_len))
    n_dirs = max(int(ao_dirs), int(ao_samples), 1)

    # the frame's direction pool + its 2*D signed shadow volumes
    # (uint8: the indicator is 0/1, and the stack stays small)
    k_dirs = jax.random.fold_in(key, 101)
    u = jax.random.normal(k_dirs, (n_dirs, 3))
    u = u / jnp.maximum(
        jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-9
    )
    vols = []
    for j in range(n_dirs):
        vols.append(shadow_volume(ind, u[j], ao_cells, max_len))
        vols.append(shadow_volume(ind, -u[j], ao_cells, max_len))
    stack = jnp.stack(vols).astype(jnp.uint8)  # (2D, nz, ny, nx)

    cos = normals_zyx @ u.T  # (P, D)
    abs_cos = jnp.abs(cos)
    p = abs_cos + 1e-3  # full support keeps the estimator unbiased
    p = p / p.sum(-1, keepdims=True)
    cdf = jnp.cumsum(p, -1)

    shadow = jnp.zeros(hit_zyx.shape[0], jnp.float32)
    for s in range(ao_samples):
        k = jax.random.fold_in(key, s)
        r = jax.random.uniform(k, (hit_zyx.shape[0],))
        j_sel = jnp.clip(
            (r[:, None] >= cdf).sum(-1), 0, n_dirs - 1
        )
        cos_sel = jnp.take_along_axis(cos, j_sel[:, None], -1)[:, 0]
        p_sel = jnp.take_along_axis(p, j_sel[:, None], -1)[:, 0]
        u_sel = u[j_sel]
        d_pix = jnp.sign(cos_sel)[:, None] * u_sel
        # stand off along the NORMAL past the indicator's own ~1.5-cell
        # shell: tangential directions then run parallel above the
        # surface slab instead of through it (self-occlusion, the
        # dominant error of volumetric AO).  Occluders closer than ~2
        # cells are missed — the lattice restatement's bias; the
        # reference's ray march re-detects crossings instead.
        probe = (hit_zyx + normals_zyx * (1.5 * cwf)
                 + d_pix * (0.5 * cwf))
        vidx = j_sel * 2 + (cos_sel < 0.0).astype(jnp.int32)
        hit = sample_lattice_indexed(stack, lo, cwf, probe, vidx)
        if geom_occluder is not None:
            hit = jnp.maximum(hit, geom_occluder(d_pix))
        w = 2.0 * jnp.abs(cos_sel) / (n_dirs * p_sel)
        shadow = shadow + jnp.clip(hit, 0.0, 1.0) * w
    return jnp.clip(shadow / ao_samples, 0.0, 1.0)
