"""Persistent XLA compilation cache.

The reference hand-rolls an on-disk kernel binary cache: filename keyed by source
file + option hash + device + driver version, mtime freshness, checksum sidecars
(KernelBuilderCLImpl, AdlKernelUtilsCL.cpp:130-237). XLA ships the same capability;
enabling it is one config call. Keying by device/compiler fingerprint, integrity
checking, and invalidation are handled inside XLA.

On this project's hardware path the first compile of the render step is expensive
(remote compile over the device tunnel), so the cache is load-bearing: bench runs and
the driver's compile checks hit it after the first run.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "OCLPT_COMPILATION_CACHE", os.path.expanduser("~/.cache/oclpathtracer_tpu/xla")
)

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent). Returns the dir used.

    Kill-switch: OCLPT_COMPILATION_CACHE=off (or "0"/"none") makes default-dir
    enablement a no-op — used by the test suite, where thousands of tiny
    interpret-mode kernel entries are useless and long cache-write sessions
    have segfaulted inside jax's zstd writer. An EXPLICIT cache_dir argument
    always wins (the cache's own unit tests exercise the real thing)."""
    global _enabled
    if cache_dir is None and DEFAULT_CACHE_DIR.lower() in ("off", "0", "none"):
        return ""
    d = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # Cache every program regardless of compile time; the render-step module is the
    # thing we most want cached and heuristics can skip "small" programs.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return d


def log_compiles(enable: bool = True) -> None:
    """Log every XLA compilation (jit cache miss) — the observability half of the
    reference's compile bracket (compile start/end logged at
    AdlKernelUtilsCL.cpp:254-264 via its CompileCallback)."""
    jax.config.update("jax_log_compiles", enable)


def register_compile_listener(callback) -> None:
    """≡ the reference's pluggable CompileCallback (Adl.h:23-30, fired around
    clBuildProgram at AdlKernelUtilsCL.cpp:254-264,353-354): `callback(event,
    seconds)` is invoked when the runtime finishes compiling a program, with the
    backend compile duration. Registration is process-wide and permanent (JAX
    exposes no deregistration), matching the reference's static callback slot."""
    from jax import monitoring

    def _listener(event: str, duration: float, **kw) -> None:
        if "compile" in event:
            callback(event, duration)

    monitoring.register_event_duration_secs_listener(_listener)
