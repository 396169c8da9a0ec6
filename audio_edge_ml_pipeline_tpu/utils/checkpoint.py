"""Mid-training checkpoint/resume for the flax train loop.

The reference checkpoints only final models (SURVEY.md §5: no mid-epoch
checkpointing); this adds per-epoch train-state checkpoints (params +
optimizer state + loop counters) as portable .npz files, enabling resume
after interruption — the role orbax fills in larger systems, kept
dependency-light and readable by numpy alone.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _flatten(tree) -> dict[str, np.ndarray]:
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template, flat: dict[str, np.ndarray]):
    import jax
    import jax.numpy as jnp

    leaves_with_path = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = flat.get(key)
        if arr is None:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        want = np.shape(leaf)
        if tuple(arr.shape) != tuple(want) and arr.ndim > 0 and len(want) > 0:
            # a reshape here would silently accept same-size permuted
            # shapes (e.g. a transposed kernel after an arch tweak) —
            # reject so load_train_state returns None as documented
            raise ValueError(f"leaf {key!r}: checkpoint shape {arr.shape} != template {want}")
        dtype = getattr(leaf, "dtype", None)
        new_leaves.append(jnp.asarray(arr.reshape(want), dtype=dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_train_state(path: Path, params, opt_state, meta: dict) -> None:
    """Atomic save of (params, opt_state, loop metadata)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {f"p/{k}": v for k, v in _flatten(params).items()}
    payload.update({f"o/{k}": v for k, v in _flatten(opt_state).items()})
    payload["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **payload)
    tmp.replace(path)


def load_train_state(path: Path, params_template, opt_template) -> Optional[tuple[Any, Any, dict]]:
    """Restore (params, opt_state, meta); None when no checkpoint exists or
    it doesn't match the templates (e.g. architecture changed)."""
    path = Path(path)
    if not path.exists():
        return None
    try:
        data = np.load(path, allow_pickle=False)
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        params = _unflatten(params_template, {k[2:]: data[k] for k in data.files if k.startswith("p/")})
        opt_state = _unflatten(opt_template, {k[2:]: data[k] for k in data.files if k.startswith("o/")})
        return params, opt_state, meta
    except Exception as exc:
        logger.warning("checkpoint %s unusable (%s); starting fresh", path, exc)
        return None
