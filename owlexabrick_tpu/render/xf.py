"""Transfer-function LUT handling.

The reference stores one 128-entry RGBA LUT per channel in a CUDA 1D
texture with linear filtering and clamp addressing
(exa/Texture.h:143-147); lookups normalize the scalar into the domain and
add a half-texel snap (programs/exabrick.cu:136-150).  On TPU there is no
texture unit: the LUT is a (C, 128, 4) array and the lerp is explicit —
this fuses straight into the marching kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.constants import NUM_XF_VALUES


def lookup_xf(lut, domain, opacity_scale, value):
    """Vectorized XF lookup (matches exabrick.cu:136-150 + tex1D lerp).

    lut: (N, 4) for one channel; domain: (2,); value: any shape.
    Returns value.shape + (4,) RGBA with alpha scaled by opacity_scale.
    """
    n = lut.shape[-2]
    lo = domain[..., 0]
    hi = domain[..., 1]
    scalar = (n - 1) * (value - lo) / ((hi - lo) + 1e-20)
    scalar = jnp.clip(scalar + 0.5, 0.0, n - 1.0) / (n - 1.0)
    # CUDA tex1D linear filtering with clamp addressing
    u = scalar * n - 0.5
    i0 = jnp.floor(u)
    frac = (u - i0)[..., None]
    i0_int = i0.astype(jnp.int32)
    i0 = jnp.clip(i0_int, 0, n - 1)
    i1 = jnp.clip(i0_int + 1, 0, n - 1)
    v0 = lut[i0]
    v1 = lut[i1]
    rgba = v0 * (1.0 - frac) + v1 * frac
    alpha = rgba[..., 3:4] * opacity_scale
    return jnp.concatenate([rgba[..., :3], alpha], axis=-1)


def make_lut(colors: np.ndarray, opacities: np.ndarray) -> np.ndarray:
    """Combine a (128,3) colormap and (128,) opacity curve into an RGBA LUT
    (exa/OptixRenderer.cpp:387-390)."""
    colors = np.asarray(colors, np.float32).reshape(NUM_XF_VALUES, 3)
    opacities = np.asarray(opacities, np.float32).reshape(NUM_XF_VALUES)
    return np.concatenate([colors, opacities[:, None]], axis=1)


def default_opacities(n: int = NUM_XF_VALUES) -> np.ndarray:
    """Linear ramp — the GLUI transfer-function widget's initial state."""
    return np.linspace(0.0, 1.0, n, dtype=np.float32)


def active_for_volume_sampling(lut, domain, opacity_scale, value_range):
    """Per-region transfer-function culling mask for one channel.

    Walks the LUT slice covered by the region's value range and reports
    whether any entry has non-zero opacity — exactly
    activeForVolumeSampling (programs/exabrick.cu:250-281), the core of
    TF-aware space skipping.  Vectorized over regions.

    lut: (N,4); domain: (2,); value_range: (R, 2).  Returns (R,) bool.
    """
    n = lut.shape[-2]
    lo = domain[0]
    hi = domain[1]
    vr_lo = value_range[..., 0]
    vr_hi = value_range[..., 1]
    inside = ~((vr_lo > hi) | (vr_hi < lo))

    scaled_lo = (vr_lo - lo) / ((hi - lo) + 1e-20)
    scaled_hi = (vr_hi - lo) / ((hi - lo) + 1e-20)
    idx_lo = jnp.clip((scaled_lo * (n - 1)).astype(jnp.int32), 0, n - 1)
    idx_hi = jnp.clip((scaled_hi * (n - 1)).astype(jnp.int32) + 1, 0, n - 1)

    # evaluate every LUT entry's alpha through the same lookup the
    # renderer uses, then test the [idx_lo, idx_hi] slice per region
    i = jnp.arange(n, dtype=jnp.float32)
    cell_values = i / (n - 1) * (hi - lo) + lo
    alphas = lookup_xf(lut, jnp.asarray([lo, hi]), opacity_scale, cell_values)[..., 3]
    in_slice = (i[None, :] >= idx_lo[..., None]) & (i[None, :] <= idx_hi[..., None])
    any_alpha = jnp.any(in_slice & (alphas[None, :] > 0.0), axis=-1)
    return inside & any_alpha
