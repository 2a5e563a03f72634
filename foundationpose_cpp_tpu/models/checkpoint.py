"""Weight persistence: save/load parameter pytrees.

The reference's model state is immutable TensorRT engine files built offline
by tools/cvt_onnx2trt.bash; the TPU equivalent is a parameter pytree on disk
(npz -- dependency-free and portable) plus XLA's own compilation cache for
the executable side.
"""

from __future__ import annotations

import json
from typing import Any

import jax.numpy as jnp
import numpy as np

_SEP = "/"


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        # list nodes (e.g. transformer layer stacks) keyed as '#<index>'
        for i, v in enumerate(tree):
            k = f"#{i}"
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _listify(node: Any) -> Any:
    """Convert dict nodes whose keys are all '#<i>' back into lists."""
    if not isinstance(node, dict):
        return node
    node = {k: _listify(v) for k, v in node.items()}
    if node and all(k.startswith("#") for k in node):
        return [node[f"#{i}"] for i in range(len(node))]
    return node


def save_params(params: Any, path: str) -> None:
    """Write a params pytree as npz (bf16 stored as uint16 + dtype map)."""
    flat = _flatten(params)
    arrays = {}
    dtypes = {}
    for k, v in flat.items():
        if v.dtype == jnp.bfloat16:
            arrays[k] = v.view(np.uint16)
            dtypes[k] = "bfloat16"
        else:
            arrays[k] = v
            dtypes[k] = str(v.dtype)
    arrays["__dtypes__"] = np.frombuffer(
        json.dumps(dtypes).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_params(path: str) -> Any:
    """Read a params pytree written by save_params."""
    data = np.load(path)
    dtypes = json.loads(bytes(data["__dtypes__"]).decode())
    tree: dict = {}
    for key, dtype_name in dtypes.items():
        arr = data[key]
        if dtype_name == "bfloat16":
            arr = arr.view(jnp.bfloat16)
        node = tree
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return _listify(tree)


def params_fingerprint(params: Any) -> str:
    """Stable content hash for cache keys / provenance logging."""
    import hashlib

    h = hashlib.sha256()
    for k, v in sorted(_flatten(params).items()):
        h.update(k.encode())
        h.update(np.ascontiguousarray(v).tobytes())
    return h.hexdigest()[:16]
