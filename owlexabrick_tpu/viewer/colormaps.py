"""Color maps: piecewise-linear control-point mapper + built-in palettes.

The reference embeds 15 colormaps as PNG strips decoded with stb
(exa/ColorMapper.h:46-61, exa/embedded_colormaps.h) plus a "Custom"
textbox format ``"pos,(r,g,b)\\n..."`` (exa/ColorMapper.cpp:92-131).
Here the same named palettes are defined procedurally from their public
control points; ``ColorMapper`` reproduces the upper_bound+lerp sampling
(exa/ColorMapper.h:63-80).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

import numpy as np


class ColorMapper:
    """Piecewise-linear RGB map over [0,1] from (position, rgb) knots."""

    def __init__(self, points: Sequence[Tuple[float, Tuple[float, float, float]]]):
        if len(points) < 2:
            raise ValueError("need at least 2 control points")
        pts = sorted(points, key=lambda p: p[0])
        self.pos = np.asarray([p[0] for p in pts], np.float32)
        self.rgb = np.asarray([p[1] for p in pts], np.float32)

    @staticmethod
    def from_colors(colors: Sequence[Tuple[float, float, float]]) -> "ColorMapper":
        n = len(colors)
        return ColorMapper(
            [(i / (n - 1), tuple(c)) for i, c in enumerate(colors)]
        )

    @staticmethod
    def from_string(text: str) -> "ColorMapper":
        """Parse the custom-colormap textbox format: ``0.0,(r,g,b)`` per line
        (exa/ColorMapper.cpp:92-131)."""
        pts = []
        for line in text.replace(";", "\n").splitlines():
            line = line.strip()
            if not line:
                continue
            m = re.match(
                r"([0-9.eE+-]+)\s*,\s*\(\s*([0-9.eE+-]+)\s*,\s*([0-9.eE+-]+)\s*,\s*([0-9.eE+-]+)\s*\)",
                line,
            )
            if not m:
                raise ValueError(f"bad colormap line: {line!r}")
            pts.append(
                (float(m.group(1)),
                 (float(m.group(2)), float(m.group(3)), float(m.group(4))))
            )
        return ColorMapper(pts)

    def __call__(self, t) -> np.ndarray:
        t = np.clip(np.asarray(t, np.float32), 0.0, 1.0)
        idx = np.searchsorted(self.pos, t, side="right")
        idx = np.clip(idx, 1, len(self.pos) - 1)
        p0 = self.pos[idx - 1]
        p1 = self.pos[idx]
        w = np.where(p1 > p0, (t - p0) / np.maximum(p1 - p0, 1e-20), 0.0)
        return (1 - w)[..., None] * self.rgb[idx - 1] + w[..., None] * self.rgb[idx]

    def sample(self, n: int) -> np.ndarray:
        return self(np.linspace(0.0, 1.0, n)).astype(np.float32)


def _hsv_to_rgb(h, s, v):
    i = int(h * 6) % 6
    f = h * 6 - int(h * 6)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    return [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)][i]


def _knots(*cols):
    n = len(cols)
    return [(i / (n - 1), c) for i, c in enumerate(cols)]


# Named palettes (public control-point definitions; names match the
# reference's GUI listbox, exa/viewer.cpp:507-523).
_BUILTIN: Dict[str, List] = {
    "Paraview Cool Warm": _knots(
        (0.231, 0.298, 0.753), (0.552, 0.690, 0.996), (0.866, 0.866, 0.866),
        (0.956, 0.603, 0.486), (0.706, 0.016, 0.150),
    ),
    "Rainbow": _knots(
        (0.0, 0.0, 1.0), (0.0, 1.0, 1.0), (0.0, 1.0, 0.0),
        (1.0, 1.0, 0.0), (1.0, 0.0, 0.0),
    ),
    "Matplotlib Plasma": _knots(
        (0.050, 0.029, 0.527), (0.417, 0.000, 0.658), (0.692, 0.165, 0.564),
        (0.881, 0.392, 0.383), (0.988, 0.652, 0.211), (0.940, 0.975, 0.131),
    ),
    "Matplotlib Virdis": _knots(
        (0.267, 0.004, 0.329), (0.282, 0.140, 0.457), (0.253, 0.265, 0.529),
        (0.206, 0.371, 0.553), (0.163, 0.471, 0.558), (0.127, 0.566, 0.550),
        (0.134, 0.658, 0.517), (0.266, 0.748, 0.440), (0.477, 0.821, 0.318),
        (0.741, 0.873, 0.149), (0.993, 0.906, 0.143),
    ),
    "Samsel Linear Green": _knots(
        (0.038, 0.090, 0.049), (0.084, 0.302, 0.204), (0.166, 0.485, 0.334),
        (0.342, 0.650, 0.447), (0.606, 0.795, 0.556), (0.835, 0.900, 0.693),
        (0.962, 0.968, 0.854),
    ),
    "Samsel Linear YGB 1211g": _knots(
        (1.000, 0.984, 0.804), (0.894, 0.925, 0.682), (0.689, 0.820, 0.604),
        (0.465, 0.699, 0.593), (0.290, 0.566, 0.607), (0.190, 0.411, 0.595),
        (0.162, 0.253, 0.529), (0.129, 0.120, 0.356),
    ),
    "Cool Warm Extended": _knots(
        (0.000, 0.000, 0.344), (0.000, 0.340, 1.000), (0.496, 0.715, 1.000),
        (0.866, 0.866, 0.866), (1.000, 0.582, 0.340), (0.871, 0.176, 0.000),
        (0.376, 0.000, 0.000),
    ),
    "Blackbody": _knots(
        (0.0, 0.0, 0.0), (0.580, 0.125, 0.063), (0.852, 0.325, 0.092),
        (0.984, 0.605, 0.180), (1.000, 0.870, 0.560), (1.0, 1.0, 1.0),
    ),
    "Jet": [
        (0.000, (0.0, 0.0, 0.5)), (0.125, (0.0, 0.0, 1.0)),
        (0.375, (0.0, 1.0, 1.0)), (0.625, (1.0, 1.0, 0.0)),
        (0.875, (1.0, 0.0, 0.0)), (1.000, (0.5, 0.0, 0.0)),
    ],
    "Blue Gold": _knots(
        (0.000, 0.059, 0.252), (0.144, 0.350, 0.595), (0.493, 0.683, 0.870),
        (0.905, 0.897, 0.893), (0.962, 0.786, 0.530), (0.880, 0.593, 0.154),
        (0.551, 0.341, 0.043),
    ),
    "Ice Fire": _knots(
        (0.000, 0.022, 0.062), (0.156, 0.340, 0.669), (0.478, 0.631, 0.859),
        (0.871, 0.871, 0.871), (0.898, 0.594, 0.306), (0.760, 0.216, 0.081),
        (0.411, 0.020, 0.015),
    ),
    "Nic Edge": _knots(
        (0.086, 0.004, 0.298), (0.168, 0.306, 0.842), (0.463, 0.604, 0.980),
        (0.867, 0.867, 0.867), (0.980, 0.643, 0.447), (0.820, 0.247, 0.102),
        (0.278, 0.000, 0.094),
    ),
    "Covise": _knots(
        (0.0, 0.0, 1.0), (0.0, 1.0, 1.0), (0.0, 1.0, 0.0),
        (1.0, 1.0, 0.0), (1.0, 0.5, 0.0), (1.0, 0.0, 0.0),
    ),
    "JamieDraft": _knots(
        (0.0, 0.0, 0.35), (0.0, 0.5, 1.0), (0.5, 1.0, 0.5),
        (1.0, 1.0, 0.0), (1.0, 0.0, 0.0),
    ),
    "HSV": [(i / 6.0, _hsv_to_rgb(i / 6.0 * (300.0 / 360.0), 1.0, 1.0))
            for i in range(7)],
    "Custom": _knots((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
}

COLORMAP_NAMES = list(_BUILTIN.keys())


def get_colormap(name: str) -> ColorMapper:
    if name not in _BUILTIN:
        raise KeyError(f"unknown colormap '{name}' (have {COLORMAP_NAMES})")
    return ColorMapper(_BUILTIN[name])


def colormap_colors(name, n: int) -> np.ndarray:
    """Sample a colormap by name, or pass a ColorMapper through."""
    if isinstance(name, ColorMapper):
        return name.sample(n)
    return get_colormap(name).sample(n)
