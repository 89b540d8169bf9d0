"""Launch replay — snapshot a render/train invocation and re-execute it later.

≡ the reference's Launcher::serializeToFile / deserializeFromFile
(AdlKernel.h:186-188; AdlKernelUtilsCL.cpp:509-620), which dumps every kernel
argument (full buffer contents + consts + ExecInfo) so a launch can be re-bound
and re-run for debugging. Here the "launch" is a jitted function call and the
"args" are a pytree: we save the flattened leaves as npz + the treedef/static
config as JSON, and replay by re-invoking the function.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Tuple

import jax
import numpy as np


def _key(i: int) -> str:
    return f"leaf_{i:04d}"


def save_launch(path: str, args: Any, meta: dict | None = None) -> None:
    """Snapshot an argument pytree (device contents included) to `path`.npz/.json."""
    leaves, treedef = jax.tree.flatten(args)
    arrays = {}
    spec = []
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        arrays[_key(i)] = a
        spec.append({"dtype": str(a.dtype), "shape": list(a.shape)})
    np.savez_compressed(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump({"treedef": str(treedef), "leaves": spec,
                   "meta": meta or {}}, f, indent=2)


def load_launch(path: str, example_args: Any) -> Any:
    """Rebuild the argument pytree (structure taken from `example_args`)."""
    data = np.load(path + ".npz")
    leaves, treedef = jax.tree.flatten(example_args)
    loaded = [jax.numpy.asarray(data[_key(i)]) for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, loaded)


def replay(fn: Callable, path: str, example_args: Any):
    """Re-execute `fn` on a snapshot (≡ deserializeFromFile + launch)."""
    args = load_launch(path, example_args)
    return fn(*args) if isinstance(args, tuple) else fn(args)
