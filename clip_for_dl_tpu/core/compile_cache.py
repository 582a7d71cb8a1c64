"""Persistent XLA compilation cache (dev-velocity: big-graph compiles
through the tunneled transport take minutes — B=256 remat'd pretrain ≈ 14
min — and the persistent cache makes every later process a disk rehit).

Verified against the axon backend: a fresh process re-compiling an
already-cached program drops from seconds/minutes to ~0.1 s (the cache
stores the backend-compiled executable, so the remote compile helper is
skipped entirely).

Opt-in via ``CLIP_FOR_DL_TPU_COMPILE_CACHE=<dir>`` (the CLI, bench.py and
tools/ call :func:`enable_from_env` before building programs) or call
:func:`enable` directly. JAX's own ``JAX_COMPILATION_CACHE_DIR`` env var
also works when set before the interpreter starts; this hook exists because
this image pre-imports jax from sitecustomize, after which only
``jax.config.update`` takes effect reliably.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger("clip_for_dl_tpu.compile_cache")

ENV_VAR = "CLIP_FOR_DL_TPU_COMPILE_CACHE"


def enable(cache_dir: str, min_compile_time_secs: float = 1.0) -> None:
    """Turn on the persistent compilation cache at ``cache_dir``.

    ``min_compile_time_secs`` keeps trivial programs out of the cache
    (JAX's default is 1 s); the expensive training graphs always qualify.
    """
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    logger.info("persistent XLA compile cache at %s", cache_dir)


def enable_from_env() -> Optional[str]:
    """Enable the cache if ``CLIP_FOR_DL_TPU_COMPILE_CACHE`` is set.

    Returns the cache dir when enabled, else None. Safe to call multiple
    times and before/after backend init (config-level, not backend-level).
    """
    cache_dir = os.environ.get(ENV_VAR)
    if cache_dir:
        enable(cache_dir)
    return cache_dir or None
