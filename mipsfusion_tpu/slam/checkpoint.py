"""Checkpoint save/load: SLAM state tensors + per-submap field params.

Layout parity with the reference Logger
(/root/reference/Logger.py:42-69, 267-298):
``<out>/ckpt_<frame|final>/`` containing one ``model_<i>.npz`` per used
submap and one ``ckpt.npz`` with the full state-tensor dict (pose
tensors, keyframe store, submap tables, active registers). The offline
mesh CLI reloads these (ref vis/render_mesh.py:58-77).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .state import SlamState


def _flatten_params(params: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_params(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for k, v in flat.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return out


def save_ckpt(ckpt_dir: str, state: SlamState,
              submap_params: List[Optional[Dict]],
              extra: Optional[Dict] = None, opt_state=None) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    for i, params in enumerate(submap_params):
        if params is None:
            continue
        np.savez_compressed(os.path.join(ckpt_dir, f"model_{i}.npz"),
                            **_flatten_params(params))
    tensors = {f"state/{name}": np.asarray(getattr(state, name))
               for name in state._fields}
    if extra:
        tensors.update({f"extra/{k}": np.asarray(v)
                        for k, v in extra.items()})
    np.savez_compressed(os.path.join(ckpt_dir, "ckpt.npz"), **tensors)
    if opt_state is not None:
        # the active submap's Adam state, saved as ordered tree leaves
        # (restored against a freshly-initialized state's treedef —
        # beyond the reference, whose checkpoints drop optimizer state)
        leaves = [np.asarray(l) for l in jax.tree.leaves(opt_state)]
        np.savez_compressed(
            os.path.join(ckpt_dir, "opt_state.npz"),
            **{f"leaf_{j}": l for j, l in enumerate(leaves)})


def load_opt_state(ckpt_dir: str, template):
    """Restore an optimizer state saved by save_ckpt against a
    freshly-initialized ``template`` (same optimizer, same params).
    Returns None when absent or structurally incompatible."""
    path = os.path.join(ckpt_dir, "opt_state.npz")
    if not os.path.exists(path):
        return None
    data = np.load(path)
    leaves = [jnp.asarray(data[f"leaf_{j}"]) for j in range(len(data.files))]
    t_leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != len(t_leaves) or any(
            l.shape != t.shape for l, t in zip(leaves, t_leaves)):
        return None
    return jax.tree.unflatten(treedef, leaves)


def load_ckpt(ckpt_dir: str) -> Tuple[SlamState, List[Optional[Dict]], Dict]:
    data = np.load(os.path.join(ckpt_dir, "ckpt.npz"))
    fields = {}
    extra = {}
    for k in data.files:
        if k.startswith("state/"):
            fields[k[len("state/"):]] = jnp.asarray(data[k])
        elif k.startswith("extra/"):
            extra[k[len("extra/"):]] = data[k]
    state = SlamState(**fields)

    n_submaps = state.localMLP_info.shape[0]
    submap_params: List[Optional[Dict]] = [None] * n_submaps
    for i in range(n_submaps):
        path = os.path.join(ckpt_dir, f"model_{i}.npz")
        if os.path.exists(path):
            flat = np.load(path)
            submap_params[i] = _unflatten_params(
                {k: flat[k] for k in flat.files})
    return state, submap_params, extra
