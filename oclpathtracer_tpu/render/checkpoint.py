"""Render checkpoint/resume.

The reference's closest analogues are (a) the progressive framebuffer itself, which
restarts cleanly at any frame index (GenerateColors.cl:314-321), and (b) the
Launcher's serializeToFile launch-replay snapshots (AdlKernelUtilsCL.cpp:509-620).
Here the checkpoint is the exact progressive state: (sum, count, next_sample) —
small, atomic (write-to-temp + rename), and restart-exact because sample streams are
counter-keyed, not stateful (core/rng.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from oclpathtracer_tpu.render.accumulate import Accumulator

_FORMAT_VERSION = 1


def save(path: str, acc: Accumulator, next_sample: int) -> None:
    tmp = path + ".tmp"
    np.savez(
        tmp,
        version=_FORMAT_VERSION,
        sum=np.asarray(acc.sum),
        count=np.asarray(acc.count),
        next_sample=next_sample,
    )
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load(path: str) -> Optional[Tuple[Accumulator, int]]:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        if int(z["version"]) != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {z['version']} in {path}")
        acc = Accumulator(sum=jnp.asarray(z["sum"]), count=jnp.asarray(z["count"]))
        return acc, int(z["next_sample"])
