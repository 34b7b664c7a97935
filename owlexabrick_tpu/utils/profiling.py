"""Tracing/profiling utilities — the aux-subsystem parity of SURVEY.md §5.

The reference offers: a per-pixel clock-cycle heat map (clockScale,
exabrick.cu:1588/1703-1707), an FPS title bar + 50-frame benchmark average
(viewer.cpp:297-339), preprocessing wall-clock prints, and memory usage
printouts.  Equivalents here:

  * ``FrameStats`` — running/average FPS with the 50-frame protocol
  * ``cost_heatmap`` — per-ray traversal-iteration counts from the
    wavefront path mapped to the red channel (the clock-scale analog;
    deterministic instead of clock-based)
  * ``trace_to`` — jax.profiler trace context for deep dives
  * ``device_memory_stats`` — live device allocation summary
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


class FrameStats:
    """Running FPS + benchmark average (exa/viewer.cpp:297-339)."""

    def __init__(self, bench_frames: int = 50):
        self.bench_frames = bench_frames
        self.reset()

    def reset(self):
        self.t_last = None
        self.frame_times = []

    def tick(self) -> Optional[str]:
        now = time.time()
        msg = None
        if self.t_last is not None:
            self.frame_times.append(now - self.t_last)
            if len(self.frame_times) == self.bench_frames:
                avg = sum(self.frame_times) / len(self.frame_times)
                msg = (
                    f"#exa: bench avg over {self.bench_frames} frames: "
                    f"{1.0/avg:.2f} FPS ({avg*1e3:.1f} ms/frame)"
                )
        self.t_last = now
        return msg

    @property
    def fps(self) -> float:
        if not self.frame_times:
            return 0.0
        window = self.frame_times[-10:]
        return len(window) / sum(window)


def cost_heatmap(iters: np.ndarray, scale: float = 0.05) -> np.ndarray:
    """Map per-ray iteration counts to [0,1] red-channel intensities, like
    the clock heat map's clockScale (exabrick.cu:1703-1707)."""
    return np.clip(np.asarray(iters, np.float32) * scale, 0.0, 1.0)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """jax.profiler trace context (open with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
