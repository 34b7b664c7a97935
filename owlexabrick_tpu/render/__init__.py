from .camera import Camera
from .dvr import RenderConfig, trace_dvr, generate_rays, locate_leaf, sample_basis
from .frame import FrameState, make_frame_state
from .scene import build_scene, scene_from_config, gather_scalars, to_device
from .surfaces import (
    SurfaceData,
    trace_streamlines,
    trace_streamlines_tiled,
    trace_surface_pass,
    trace_triangles,
    trace_triangles_tiled,
)
