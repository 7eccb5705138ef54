"""Config system: recursive YAML loader with single-parent ``inherit_from``.

Parity: /root/reference/utils/config.py:4-48 (load_config / update_recursive).
Our loader adds defaults injection and dotted-path overrides but keeps the
same inheritance semantics: a child yaml names its parent via
``inherit_from`` and its values win over the parent's on a deep merge.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml


def update_recursive(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    """Deep-merge ``src`` into ``dst`` in place (src wins on leaves)."""
    for k, v in src.items():
        if k not in dst:
            dst[k] = {}
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            update_recursive(dst[k], v)
        else:
            dst[k] = v


def load_config(path: str, default_path: Optional[str] = None) -> Dict[str, Any]:
    """Load a YAML config, recursively resolving ``inherit_from`` chains.

    ``inherit_from`` is resolved relative to the current working directory
    first (matching the reference's repo-root-relative convention), then
    relative to the directory of the child file.
    """
    with open(path, "r") as f:
        cfg_special = yaml.full_load(f) or {}

    inherit = cfg_special.get("inherit_from")
    if inherit is not None:
        if not os.path.exists(inherit):
            candidate = os.path.join(os.path.dirname(path), inherit)
            if os.path.exists(candidate):
                inherit = candidate
        cfg = load_config(inherit, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.full_load(f) or {}
    else:
        cfg = {}

    update_recursive(cfg, cfg_special)
    cfg.pop("inherit_from", None)
    return cfg


def apply_overrides(cfg: Dict[str, Any], overrides: Dict[str, Any]) -> Dict[str, Any]:
    """Return a copy of ``cfg`` with dotted-path overrides applied.

    e.g. ``apply_overrides(cfg, {"mapping.iters": 5})``.
    """
    out = copy.deepcopy(cfg)
    for dotted, value in overrides.items():
        node = out
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out
