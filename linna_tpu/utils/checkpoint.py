"""Pickle-free pytree checkpointing.

The reference persists ``last.pth.tar``/``best.pth.tar`` torch checkpoints
every epoch and resumes from best (linna/nnutils.py:109-151,
linna/predictor_gpu.py:405-419,451-459).  Here a checkpoint is a flat ``.npz``
of pytree leaves keyed by their tree paths plus a small JSON sidecar of scalar
metadata — loadable into any pytree with the same structure, safe against
arbitrary-code-execution on load, and writable atomically (tmp + rename) so a
crash mid-write never corrupts the resume artifact.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "checkpoint_exists",
    "read_checkpoint_raw",
    "params_from_raw",
]


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    # device_get first: it starts all leaves' device->host copies before
    # blocking, so the transfer costs ~one round trip instead of one per
    # leaf (an opt_state has ~60 leaves; sequential np.asarray fetches
    # measured >1 s per checkpoint on a tunneled device)
    leaves = jax.tree_util.tree_flatten_with_path(jax.device_get(tree))[0]
    out = {}
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "V":
            # npz has no record of ml_dtypes types (bf16 AdamW moments under
            # compute_dtype): they round-trip as raw |V2 bytes that no later
            # np.load can interpret.  Widen to f32 on save (exact for bf16);
            # load casts back to the template leaf's dtype (also exact).
            arr = arr.astype(np.float32)
        out[_path_key(path)] = arr
    return out


def _unflatten_like(tree: Any, arrays: Dict[str, np.ndarray], prefix: str) -> Any:
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    new_leaves = []
    for path, old_leaf in leaves_with_paths:
        key = prefix + _path_key(path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = arrays[key]
        if tuple(arr.shape) != tuple(np.shape(old_leaf)):
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != expected "
                f"{np.shape(old_leaf)}"
            )
        # read the dtype from the attribute: np.asarray(old_leaf) would pull
        # every template leaf to the host (a blocking device->host copy per
        # leaf — the exact cost _flatten documents avoiding on save — and a
        # RuntimeError for non-fully-addressable pod-sharded leaves)
        dtype = getattr(old_leaf, "dtype", None) or np.asarray(old_leaf).dtype
        new_leaves.append(jax.numpy.asarray(arr, dtype=dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Write ``{params, opt_state}`` pytrees and JSON-able ``meta`` atomically."""
    arrays = {f"params/{k}": v for k, v in _flatten(params).items()}
    if opt_state is not None:
        arrays.update({f"opt/{k}": v for k, v in _flatten(opt_state).items()})
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(
    path: str, params_like: Any, opt_state_like: Any = None
) -> Tuple[Any, Any, Dict[str, Any]]:
    """Load a checkpoint into pytrees shaped like the given templates.

    Returns (params, opt_state_or_None, meta).
    """
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays.pop("__meta__")).decode()) if "__meta__" in arrays else {}
    params = _unflatten_like(params_like, arrays, "params/")
    opt_state = None
    if opt_state_like is not None and any(k.startswith("opt/") for k in arrays):
        opt_state = _unflatten_like(opt_state_like, arrays, "opt/")
    return params, opt_state, meta


def checkpoint_exists(path: str) -> bool:
    return os.path.isfile(path)


def read_checkpoint_raw(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Read a checkpoint's raw flat arrays + meta WITHOUT a template.

    The file-read half of :func:`load_checkpoint`, split out so a pod
    primary can read once and ship the picklable payload to every host
    (``multihost.broadcast_from_primary``) before each host unflattens
    locally via :func:`params_from_raw`.
    """
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    meta = (
        json.loads(bytes(arrays.pop("__meta__")).decode())
        if "__meta__" in arrays
        else {}
    )
    return arrays, meta


def params_from_raw(params_like: Any, arrays: Dict[str, np.ndarray]) -> Any:
    """Unflatten the ``params/`` half of a :func:`read_checkpoint_raw` payload
    into a pytree shaped like ``params_like``."""
    return _unflatten_like(params_like, arrays, "params/")
