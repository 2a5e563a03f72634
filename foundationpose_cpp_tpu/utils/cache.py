"""Persistent XLA compilation cache helper.

The reference pays its compile cost offline (trtexec engine builds,
tools/cvt_onnx2trt.bash); XLA compiles per (mesh, image size, refine_itr)
profile at first use (~0.5-2 min for the full Register program). Enabling the
persistent cache gives the same build-once-deploy-many behavior: later
processes load the compiled executable instead of recompiling.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/foundationpose_cpp_tpu/xla") -> str:
    """Enable JAX's persistent compilation cache at `path` (idempotent)."""
    import jax

    full = os.path.expanduser(path)
    os.makedirs(full, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", full)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return full
