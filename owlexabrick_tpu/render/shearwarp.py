"""Exact arbitrary-camera fast path: shear-warp factorization of the
slab sweep (replaces the reorient_grids preview for tilted views).

The slab sweep (render/slabs.py) renders any camera whose rays form a
uniform lattice in *normalized ray space*: with the sweep axis permuted
to z, every eye ray is characterized by (xi, eta) = (rx/rz, ry/rz), and
a separable camera is exactly a uniform (xi, eta) lattice.  An
arbitrarily oriented perspective camera shares the same eye, so its
pencil of rays can be covered by an axis-aligned *intermediate* camera:
a uniform lattice over the bounding box of the real frustum's (xi, eta)
corner coordinates.  Rendering that intermediate camera with the sweep
megakernel samples the volume **exactly** (the same tent-matmul basis
reconstruction as an aligned view — no volume resampling, unlike
reorient_grids); the screen image is then a single 2-D homography warp
of the intermediate image, because ray (u, v) has lattice coordinates

    i(u, v) = (xi(u, v) - xi0) / dxi - 1/2,   xi = rx/rz  (projective),

a ratio of affine forms in (u, v).  This is the perspective shear-warp
factorization (Lacroute & Levoy 1994) built on the MXU sweep; the only
approximation versus per-pixel ray marching is the final bilinear image
resample, so accuracy is controlled by the intermediate oversampling
factor rather than by a 3-D grid resample per level.

Semantics parity: the intermediate render uses the same slab quadrature,
opacity correction and TF classification as the aligned fast path
(exabrick.cu:1662-1699, 988-1016); the per-pixel path-length factor
``sec = |r|/|rz|`` in render_slabs is exact for oblique rays, so every
intermediate lattice ray is integrated exactly like a wavefront ray with
slab-plane sampling.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .slabs import permute_camera, render_slabs_camera


@dataclass(frozen=True)
class ShearWarp:
    """Per-(camera, screen-size) shear-warp factorization."""

    camera: Camera  # intermediate axis-aligned camera (voxel frame)
    width: int  # intermediate lattice dims (static per screen size)
    height: int
    # homography rows (P_i, P_j, P_w) over (u, v, 1): lattice coords of
    # screen position (u, v) are (P_i.q / P_w.q, P_j.q / P_w.q)
    hom: np.ndarray  # (3, 3) float64
    axis: int


def inter_dims(width: int, height: int, oversample: float = 1.5):
    """Static intermediate lattice dims for a screen size.

    The (xi, eta) bounding box of a tilted frustum is larger than the
    screen's own footprint (up to ~2x area at 45 degree tilt/roll);
    ``oversample`` keeps the lattice at least as dense as the screen
    rays so the final bilinear warp stays sub-pixel."""

    def up(n, m):
        return -(-n // m) * m

    iw = up(int(np.ceil(width * oversample)), 128 if width >= 128 else 8)
    ih = up(int(np.ceil(height * oversample)), 8)
    return iw, ih


def setup_shearwarp(
    camera: Camera, axis: int, width: int, height: int,
    iw: int, ih: int, min_rz: float = 0.25,
):
    """Factorize ``camera`` (voxel frame) for a sweep along ``axis``.

    Returns a ShearWarp, or None when the frustum is too oblique for the
    factorization (a corner ray nearly parallel to the slab planes —
    rz sign change or |rz|/|r| below ``min_rz``)."""
    pos_p, d00_p, du_p, dv_p = (
        np.asarray(v, np.float64) for v in permute_camera(camera, axis)
    )
    corners = []
    for u, v in ((0.0, 0.0), (width, 0.0), (0.0, height), (width, height)):
        corners.append(d00_p + u * du_p + v * dv_p)
    corners = np.stack(corners)  # (4, 3) in (z, y, x) order
    rz = corners[:, 0]
    rn = np.linalg.norm(corners, axis=1)
    if np.any(rz > 0) and np.any(rz < 0):
        return None
    if np.min(np.abs(rz) / rn) < min_rz:
        return None
    s = 1.0 if rz[0] > 0 else -1.0

    xi = corners[:, 2] / rz
    eta = corners[:, 1] / rz
    xi0, xi1 = float(xi.min()), float(xi.max())
    eta0, eta1 = float(eta.min()), float(eta.max())
    # three lattice cells of pad each side keep screen samples — plus
    # +-1/2 px screen jitter and +-1/2 cell lattice-phase jitter — inside
    # the bicubic interior (which needs one extra support cell)
    pad = 3
    dxi = max(xi1 - xi0, 1e-12) / (iw - 2 * pad)
    deta = max(eta1 - eta0, 1e-12) / (ih - 2 * pad)
    xi0p = xi0 - pad * dxi
    eta0p = eta0 - pad * deta

    # intermediate camera in the permuted (z, y, x) frame:
    # r'(i, j) = s * (1, eta0p + (j+.5) deta, xi0p + (i+.5) dxi)
    d00_i = np.array([s, s * eta0p, s * xi0p])
    du_i = np.array([0.0, 0.0, s * dxi])
    dv_i = np.array([0.0, s * deta, 0.0])

    # un-permute back to the voxel frame: grid slot g holds world axis
    # perm[g] (permute_camera)
    other = [a for a in (2, 1, 0) if a != axis]
    perm = (axis, *other)

    def unperm(p_vec):
        w = np.zeros(3)
        for g in range(3):
            w[perm[g]] = p_vec[g]
        return w.astype(np.float32)

    cam_i = Camera(
        pos=np.asarray(camera.pos, np.float32),
        dir00=unperm(d00_i),
        dir_du=unperm(du_i),
        dir_dv=unperm(dv_i),
    )

    # homography: i(u,v) = (num_x - xi0p*den)/(dxi*den) - 1/2 with
    # num_x, den affine in (u, v); fold the -1/2 into the numerator row
    def affine(comp):  # (du_coeff, dv_coeff, const) of ray component
        return np.array([du_p[comp], dv_p[comp], d00_p[comp]])

    p_w = affine(0)
    p_i = (affine(2) - xi0p * p_w) / dxi - 0.5 * p_w
    p_j = (affine(1) - eta0p * p_w) / deta - 0.5 * p_w
    hom = np.stack([p_i, p_j, p_w])
    return ShearWarp(camera=cam_i, width=iw, height=ih, hom=hom, axis=axis)


def _warp_coords(sw: ShearWarp, width, height, jx, jy, shift_i, shift_j):
    hom = jnp.asarray(sw.hom, jnp.float32)
    f32 = jnp.float32
    uu = jnp.arange(width, dtype=f32)[None, :] + jx  # (1, W)
    vv = jnp.arange(height, dtype=f32)[:, None] + jy  # (H, 1)
    den = hom[2, 0] * uu + hom[2, 1] * vv + hom[2, 2]
    i = (hom[0, 0] * uu + hom[0, 1] * vv + hom[0, 2]) / den - shift_i
    j = (hom[1, 0] * uu + hom[1, 1] * vv + hom[1, 2]) / den - shift_j
    return i, j


def warp_bilinear(rgba_i, sw: ShearWarp, width: int, height: int,
                  jx=0.5, jy=0.5, shift_i=0.0, shift_j=0.0):
    """Resample the intermediate image to the screen (bilinear).

    rgba_i: (iw*ih, 4) row-major from render_slabs_camera.  jx/jy: screen
    sub-pixel jitter (dynamic scalars — no recompile per frame).
    shift_i/shift_j: intermediate-lattice phase shift in lattice cells
    (when the caller jittered the intermediate camera's dir00 by that
    fraction of du/dv, the same ray moves to lattice coord i - shift_i).
    Returns (width*height, 4).
    """
    iw, ih = sw.width, sw.height
    f32 = jnp.float32
    i, j = _warp_coords(sw, width, height, jx, jy, shift_i, shift_j)
    i = jnp.clip(i, 0.0, iw - 1.0)
    j = jnp.clip(j, 0.0, ih - 1.0)
    i0 = jnp.clip(jnp.floor(i).astype(jnp.int32), 0, iw - 2)
    j0 = jnp.clip(jnp.floor(j).astype(jnp.int32), 0, ih - 2)
    fi = i - i0.astype(f32)
    fj = j - j0.astype(f32)

    c = rgba_i.shape[1]
    img = rgba_i.T.reshape(c, ih * iw)  # components lead (no 4-pad)
    base = (j0 * iw + i0).reshape(-1)  # (P,)

    def tap(off):
        return jnp.take(img, base + off, axis=1)  # (4, P)

    fi = fi.reshape(-1)[None]
    fj = fj.reshape(-1)[None]
    out = (
        tap(0) * (1 - fi) * (1 - fj)
        + tap(1) * fi * (1 - fj)
        + tap(iw) * (1 - fi) * fj
        + tap(iw + 1) * fi * fj
    )
    return out.T  # (P, 4)


def warp_bicubic(rgba_i, sw: ShearWarp, width: int, height: int,
                 jx=0.5, jy=0.5, shift_i=0.0, shift_j=0.0):
    """Catmull-Rom warp: sharper reconstruction of the smooth composited
    field than bilinear (interior error ~5x lower at the same lattice
    density), so the default oversample stays modest.  Output is clamped
    to the valid range (Catmull-Rom can overshoot at hard silhouettes)."""
    iw, ih = sw.width, sw.height
    f32 = jnp.float32
    i, j = _warp_coords(sw, width, height, jx, jy, shift_i, shift_j)
    i = jnp.clip(i, 1.0, iw - 2.0 - 1e-4)
    j = jnp.clip(j, 1.0, ih - 2.0 - 1e-4)
    i0 = jnp.floor(i).astype(jnp.int32)
    j0 = jnp.floor(j).astype(jnp.int32)
    fi = (i - i0.astype(f32)).reshape(-1)[None]
    fj = (j - j0.astype(f32)).reshape(-1)[None]

    c = rgba_i.shape[1]
    img = rgba_i.T.reshape(c, ih * iw)
    base = (j0 * iw + i0).reshape(-1)

    def cr(t):  # Catmull-Rom weights at offsets -1, 0, 1, 2
        t2 = t * t
        t3 = t2 * t
        return (
            -0.5 * t3 + t2 - 0.5 * t,
            1.5 * t3 - 2.5 * t2 + 1.0,
            -1.5 * t3 + 2.0 * t2 + 0.5 * t,
            0.5 * t3 - 0.5 * t2,
        )

    wx = cr(fi)
    wy = cr(fj)
    out = 0.0
    for b in range(4):
        row = 0.0
        for a in range(4):
            row = row + wx[a] * jnp.take(
                img, base + (b - 1) * iw + (a - 1), axis=1
            )
        out = out + wy[b] * row
    # alpha stays in [0,1]; color stays non-negative (front-to-back
    # accumulation is never negative)
    if c == 4:
        out = jnp.concatenate(
            [jnp.maximum(out[:3], 0.0), jnp.clip(out[3:4], 0.0, 1.0)],
            axis=0,
        )
    else:
        out = jnp.maximum(out, 0.0)
    return out.T


def render_slabs_shearwarp(grids, fs, cfg, camera, width: int, height: int,
                           sw: ShearWarp | None = None, t_stop=None,
                           jx=0.5, jy=0.5, oversample: float = 1.5,
                           filter: str = "bicubic"):
    """Render an arbitrarily oriented camera exactly through the sweep.

    ``camera`` must already be in voxel space; ``grids.axis`` selects the
    sweep axis (callers pick it from the view direction).  ``t_stop`` is
    per *intermediate* pixel (surface passes run on intermediate rays).
    Raises ValueError when the factorization fails (frustum too oblique
    for any axis — callers fall back to the wavefront path)."""
    if sw is None:
        iw, ih = inter_dims(width, height, oversample)
        sw = setup_shearwarp(camera, grids.axis, width, height, iw, ih)
        if sw is None:
            raise ValueError(
                "camera too oblique for shear-warp along this axis"
            )
    rgba_i = render_slabs_camera(
        grids, fs, cfg, sw.camera, sw.width, sw.height, t_stop=t_stop
    )
    warp = warp_bicubic if filter == "bicubic" else warp_bilinear
    return warp(rgba_i, sw, width, height, jx=jx, jy=jy)
