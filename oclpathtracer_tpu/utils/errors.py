"""Error/log subsystem — ≡ AdlError.h (TahoeErrorCodes, ADLASSERT, ADL_LOG).

The reference defines an error-code enum (AdlError.h:24-41), a debug-only assert
that compiles out in release (AdlError.h:43-53), debug printf (AdlError.h:61-92),
and a pluggable log callback (s_logCallback, AdlError.h:98-104; default printf
Adl.cpp:235-238). Python equivalents: a typed exception hierarchy + `logging` with
a swappable handler; device-side asserts use jax.debug/checkify (see check_finite).
"""

from __future__ import annotations

import enum
import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger("oclpathtracer_tpu")


class ErrorCode(enum.Enum):
    """≡ TahoeErrorCodes (AdlError.h:24-41) — kept for diagnostics parity."""

    SUCCESS = 0
    ERROR_INTERNAL = 1
    ERROR_OUT_OF_MEMORY = 2
    ERROR_INVALID_VALUE = 3
    ERROR_IO = 4
    ERROR_UNSUPPORTED = 5


class PathTracerError(Exception):
    def __init__(self, code: ErrorCode, message: str = ""):
        self.code = code
        super().__init__(f"[{code.name}] {message}")


def require(condition: bool, code: ErrorCode = ErrorCode.ERROR_INTERNAL,
            message: str = "") -> None:
    """Host-side assert that RAISES in all build modes — deliberately stronger
    than the reference's ADLASSERT, which compiles to a no-op in release
    (AdlError.h:43-53) and so silently ignores broken invariants."""
    if not condition:
        raise PathTracerError(code, message)


def set_log_callback(fn: Optional[Callable[[str], None]]) -> None:
    """≡ setLogCallback (AdlError.h:100-104): route framework logs elsewhere."""
    for h in list(logger.handlers):
        logger.removeHandler(h)
    if fn is not None:
        class _Cb(logging.Handler):
            def emit(self, record):
                fn(self.format(record))

        logger.addHandler(_Cb())
    else:
        logger.addHandler(logging.NullHandler())


def check_finite(x: jnp.ndarray, name: str = "value") -> jnp.ndarray:
    """Device-side guard (debug builds of the render path): error if non-finite.

    Uses jax.experimental.checkify-compatible debug check; cheap enough to leave
    in tests, stripped from bench paths.
    """
    from jax.experimental import checkify

    checkify.check(jnp.isfinite(x).all(), f"non-finite {name}")
    return x
