"""Persistent XLA compilation cache for the user-facing entry points.

The interactive surfaces (bench.py, the offline and web viewers) pay
10-90 s of jit compilation per (scene shape, config) on first use; the
compiled executables are deterministic functions of the traced program,
so JAX's persistent compilation cache removes that cost for every
process after the first (measured on the dev TPU: the 256^3 cached-pose
prepare drops from ~170 s of compiles to sub-second loads).  The CUDA
reference gets the same effect for free from the driver's on-disk PTX
JIT cache; this is the explicit JAX equivalent.

Library code never enables this at import time — only CLIs opt in, so
tests and embedders keep JAX's defaults.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    ``path`` defaults to ``$OWLEXABRICK_COMPILE_CACHE`` or
    ``~/.cache/owlexabrick_tpu/jax``; set the env var to ``0`` to opt
    out.  Returns the directory in use (None when disabled).  Safe to
    call more than once and before or after backend initialization —
    only executables compiled afterwards are cached.
    """
    env = os.environ.get("OWLEXABRICK_COMPILE_CACHE")
    if env == "0":
        return None
    cache_dir = path or env or os.path.expanduser(
        "~/.cache/owlexabrick_tpu/jax"
    )
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if os.environ.get("OWLEXABRICK_EXPLAIN_CACHE") == "1":
        # debug aid: log WHY a persistent-cache lookup missed
        try:
            jax.config.update("jax_explain_cache_misses", True)
        except Exception:  # pragma: no cover
            pass
    return cache_dir
