"""Embedded-colormap parity: the named palettes must reproduce the
reference's PNG strips (exa/embedded_colormaps.h decoded per
exa/ColorMapper.h:46-61) within 1/256 per texel."""

import io
import os

import numpy as np
import pytest

from owlexabrick_tpu.utils.png import write_png
from owlexabrick_tpu.viewer.colormaps import (
    COLORMAP_NAMES,
    ColorMapper,
    get_colormap,
)
from owlexabrick_tpu.viewer.palettes_data import PALETTE_NAMES, palette_strip

REF_HEADER = "/root/reference/exa/embedded_colormaps.h"


def test_from_png_bytes_roundtrip():
    rgb = np.stack(
        [np.arange(64), 255 - np.arange(64), np.full(64, 7)], axis=1
    ).astype(np.uint8)[None]
    buf = io.BytesIO()
    write_png(buf, rgb)
    cm = ColorMapper.from_png_bytes(buf.getvalue())
    got = cm(np.linspace(0, 1, 64))
    np.testing.assert_allclose(got, rgb[0] / 255.0, atol=1e-6)


def test_named_palettes_sampleable():
    for name in COLORMAP_NAMES:
        lut = get_colormap(name).sample(128)
        assert lut.shape == (128, 3)
        assert np.all(lut >= 0) and np.all(lut <= 1)


def test_strip_interpolation_matches_reference_formula():
    # ColorMapper.h:63-80: upper_bound + lerp between adjacent points
    strip = palette_strip("Jet")
    cm = ColorMapper.from_strip(strip)
    w = strip.shape[0]
    t = 0.5 / (w - 1)  # halfway between texel 0 and 1
    expect = 0.5 * (strip[0] / 255.0 + strip[1] / 255.0)
    np.testing.assert_allclose(cm(t), expect, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_HEADER), reason="no reference")
def test_palettes_match_reference_strips():
    from owlexabrick_tpu.tools.extract_embedded_colormaps import decode_strips

    ref = decode_strips(REF_HEADER)
    assert set(ref) == set(PALETTE_NAMES)
    for name, strip in ref.items():
        ours = palette_strip(name)
        assert ours.shape == strip.shape
        np.testing.assert_array_equal(ours, strip)
        # the ColorMapper samples the strip exactly at texel positions
        lut = get_colormap(name)(np.linspace(0, 1, strip.shape[0]))
        assert np.abs(lut - strip / 255.0).max() <= 1.0 / 256.0
