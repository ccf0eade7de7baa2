"""Persistent XLA compilation-cache activation.

TPU compiles here are expensive (20-40 s for the 1.3B DiT step, more for
A14B shapes) and every bench phase / chip-queue step runs in its OWN
subprocess (tunnel-wedge isolation — see bench.py), so without a disk
cache the same programs recompile once per phase. Enabling JAX's
persistent compilation cache makes every phase after the first start
warm, which directly shrinks the wall time of the driver's bench run and
lets more chip-queue steps fit before a round deadline.

Activation is via the ``JAX_COMPILATION_CACHE_DIR`` env var when JAX has
not been imported yet (so subprocesses inherit it for free), falling back
to ``jax.config.update`` when it has. If the backend's PJRT plugin cannot
serialize executables, JAX degrades to a per-process compile with a
warning — never an error — so this is safe to enable unconditionally.

Reference analog: torch.compile / CUDA kernel caches the reference relies
on implicitly via torch; the reference has no explicit equivalent.
"""
from __future__ import annotations

import os
import sys

# repo-side (not /tmp): /tmp is wiped on a VM restart, and a cold cache
# turns every phase's 20-40 s warm compile back into minutes
DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")

ENV_DISABLE = "OMNIVIDEO_COMPILE_CACHE"        # "0"/"false" disables
ENV_DIR = "OMNIVIDEO_COMPILE_CACHE_DIR"        # overrides the directory


def enable_persistent_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a shared directory.

    Returns the cache dir, or None when disabled/unavailable. Idempotent;
    an explicit ``JAX_COMPILATION_CACHE_DIR`` already in the environment
    wins over our default.
    """
    if os.environ.get(ENV_DISABLE, "1").lower() in ("0", "false"):
        return None
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.environ.get(ENV_DIR) or DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    if "jax" in sys.modules:  # env var was read at import; update directly
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir", path)
        except Exception:
            return None
    return path
