"""YAML config system with single-parent inheritance.

Mirrors the reference's public config surface (``utils/config.py:7-19``):
a YAML file may name a ``parent:`` config whose keys it deep-merges over.
Loss terms are activated by *presence of the key* in a stage's ``losses``
dict (``optimization.py:87-117`` pattern), so configs stay plain dicts.
"""
from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml


def _deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for key, value in override.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = copy.deepcopy(value)
    return out


def load_config(filename: str, _depth: int = 0) -> Optional[Dict[str, Any]]:
    """Load a YAML config, recursively merging its ``parent`` chain.

    Relative parent paths resolve against the current working directory
    first (reference behavior) and then against the child file's directory
    and this repo's ``configs/`` as fallbacks.
    """
    if _depth > 16:
        raise RecursionError(f"config parent chain too deep at {filename}")
    with open(filename, "r") as stream:
        output = yaml.safe_load(stream)

    parent = output.get("parent")
    if parent:
        candidates = [
            parent,
            os.path.join(os.path.dirname(os.path.abspath(filename)), os.path.basename(parent)),
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "..", "configs", os.path.basename(parent)),
        ]
        parent_path = next((c for c in candidates if os.path.exists(c)), None)
        if parent_path is None:
            raise FileNotFoundError(f"parent config {parent!r} (from {filename}) not found")
        parent_output = load_config(parent_path, _depth + 1)
        output = _deep_merge(parent_output, output)
    return output


def default_config_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "configs")
