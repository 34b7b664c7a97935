"""Per-frame render state: the analog of the reference's FrameState +
LaunchParams scalars (programs/FrameState.h:29-71, LaunchParams.h:26-80),
as a jit-friendly pytree.

Everything here can change between frames without recompiling: camera,
transfer functions, iso values, contour planes, clip box, dt, frame id.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from ..core.constants import (
    MAX_CONTOUR_PLANES,
    MAX_ISO_SURFACES,
    NUM_XF_VALUES,
)
from ..core.types import _pytree_dataclass
from .camera import Camera
from .xf import default_opacities, make_lut
from ..viewer.colormaps import colormap_colors

Array = Any


@_pytree_dataclass
class FrameState:
    # camera
    cam_pos: Array  # (3,)
    cam_dir00: Array  # (3,)
    cam_du: Array  # (3,)
    cam_dv: Array  # (3,)

    # transfer functions, one per channel
    xf_lut: Array  # (C, NUM_XF_VALUES, 4)
    xf_domain: Array  # (C, 2)
    xf_opacity_scale: Array  # ()

    # sampling
    dt: Array  # () — sampling rate relative to cell size
    frame_id: Array  # () int32 — progressive accumulation index

    # iso surfaces
    iso_enabled: Array  # (MAX_ISO_SURFACES,) bool
    iso_value: Array  # (MAX_ISO_SURFACES,)
    iso_channel: Array  # (MAX_ISO_SURFACES,) int32

    # contour planes
    contour_enabled: Array  # (MAX_CONTOUR_PLANES,) bool
    contour_normal: Array  # (MAX_CONTOUR_PLANES, 3)
    contour_offset: Array  # (MAX_CONTOUR_PLANES,)
    contour_channel: Array  # (MAX_CONTOUR_PLANES,) int32

    # clip box (world space)
    clip_enabled: Array  # () bool
    clip_lo: Array  # (3,)
    clip_hi: Array  # (3,)

    # ambient occlusion
    ao_enabled: Array  # () bool
    ao_length: Array  # ()

    # shading toggles (runtime ints in the reference, LaunchParams.h:64-67)
    gradient_shading_dvr: Array  # () bool
    gradient_shading_iso: Array  # () bool

    # particle-tracer display timestep: streamline segments whose head
    # timestep is >= this are hidden (the streamline bounds program's
    # cull, exabrick.cu:536-570).  A huge default shows everything, so
    # static trace tables behave as before; the interactive viewer sets
    # it to the tracer's current step for the live-advect display.
    tracer_timestep: Array = np.int32(1 << 30)  # () int32


def make_frame_state(
    camera: Camera,
    num_channels: int = 1,
    xf_domains: Array | None = None,
    colormap: str = "Jet",
    opacities: Array | None = None,
    opacity_scale: float = 1.0,
    dt: float = 0.5,
    frame_id: int = 0,
    gradient_shading_dvr: bool = False,
    gradient_shading_iso: bool = True,
    ao_enabled: bool = False,
    ao_length: float = 1e20,
) -> FrameState:
    c = max(num_channels, 1)
    colors = colormap_colors(colormap, NUM_XF_VALUES)
    if opacities is None:
        opacities = default_opacities()
    lut = make_lut(colors, opacities)
    if xf_domains is None:
        xf_domains = np.tile(np.asarray([0.0, 1.0], np.float32), (c, 1))
    xf_domains = np.asarray(xf_domains, np.float32).reshape(c, 2)
    return FrameState(
        cam_pos=np.asarray(camera.pos, np.float32),
        cam_dir00=np.asarray(camera.dir00, np.float32),
        cam_du=np.asarray(camera.dir_du, np.float32),
        cam_dv=np.asarray(camera.dir_dv, np.float32),
        xf_lut=np.tile(lut[None], (c, 1, 1)).astype(np.float32),
        xf_domain=xf_domains,
        xf_opacity_scale=np.float32(opacity_scale),
        dt=np.float32(dt),
        frame_id=np.int32(frame_id),
        iso_enabled=np.zeros(MAX_ISO_SURFACES, bool),
        iso_value=np.zeros(MAX_ISO_SURFACES, np.float32),
        iso_channel=np.zeros(MAX_ISO_SURFACES, np.int32),
        contour_enabled=np.zeros(MAX_CONTOUR_PLANES, bool),
        contour_normal=np.tile(
            np.asarray([1.0, 0.0, 0.0], np.float32), (MAX_CONTOUR_PLANES, 1)
        ),
        contour_offset=np.full(MAX_CONTOUR_PLANES, 0.5, np.float32),
        contour_channel=np.zeros(MAX_CONTOUR_PLANES, np.int32),
        clip_enabled=np.bool_(False),
        clip_lo=np.zeros(3, np.float32),
        clip_hi=np.ones(3, np.float32),
        ao_enabled=np.bool_(ao_enabled),
        ao_length=np.float32(ao_length),
        gradient_shading_dvr=np.bool_(gradient_shading_dvr),
        gradient_shading_iso=np.bool_(gradient_shading_iso),
    )


def with_camera(fs: FrameState, camera: Camera) -> FrameState:
    return dataclasses.replace(
        fs,
        cam_pos=np.asarray(camera.pos, np.float32),
        cam_dir00=np.asarray(camera.dir00, np.float32),
        cam_du=np.asarray(camera.dir_du, np.float32),
        cam_dv=np.asarray(camera.dir_dv, np.float32),
    )
