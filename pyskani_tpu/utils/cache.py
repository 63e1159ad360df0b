"""Persistent XLA compilation cache.

The flagship chain/sketch programs take minutes to compile on a TPU the
first time (large sorts + Pallas kernels); the persistent cache brings
repeat runs — CLI invocations, benchmarks, CI — down to seconds.  The
reference binding has no compilation step at all, so amortising ours is
part of matching its interactive latency.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
_enabled = False


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX at a persistent on-disk compilation cache.

    Priority: explicit ``path`` > ``PYSKANI_TPU_CACHE_DIR`` env var >
    ``.jax_cache/`` next to the package.  Idempotent.  Returns the path.
    Set ``PYSKANI_TPU_CACHE_DIR=""`` (empty) to disable.
    """
    global _enabled
    env = os.environ.get("PYSKANI_TPU_CACHE_DIR")
    if path is None:
        if env is not None:
            if not env:
                return ""
            path = env
        else:
            path = _DEFAULT
    if _enabled:
        return path
    import jax

    # accelerator executables serialize portably; XLA:CPU AOT results
    # are compiled for the exact host CPU feature set, and DEserialising
    # one written by a different machine can SIGILL/segfault (observed:
    # a cache populated on an avx512 host crashed the CPU test suite on
    # the next host).  CPU compiles are fast — skip the persistent
    # cache entirely off-accelerator.
    if jax.default_backend() == "cpu":
        return ""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
    return path
