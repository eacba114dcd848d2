"""Typed, freezable configuration trees.

Self-built replacement for the yacs `CfgNode` usage in the reference
(/root/reference/defaults.py:1-37, /root/reference/experiment_config.py:33-42,
/root/reference/evaluation/policy_defaults.py:99-145): hierarchical nodes,
YAML merging with type checking against the defaults tree, freezing,
`INHERIT` file chaining, and value validation.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Iterator, Optional

import yaml


class ConfigError(Exception):
    pass


class ConfigNode:
    """Hierarchical config node with attribute access and type-checked merge.

    Unlike a plain dict, merging a value whose type differs from the default
    raises (with None and int<->float allowed), and frozen nodes reject all
    mutation — the same safety contract yacs gave the reference.
    """

    __slots__ = ("_fields", "_frozen")

    def __init__(self, init: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_fields", {})
        object.__setattr__(self, "_frozen", False)
        if init:
            for k, v in init.items():
                self[k] = ConfigNode(v) if isinstance(v, dict) else v

    # -- mapping / attribute protocol -------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._fields[name]
        except KeyError:
            raise AttributeError(f"config has no key {name!r}") from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __getitem__(self, name: str) -> Any:
        return self._fields[name]

    def __setitem__(self, name: str, value: Any) -> None:
        if self._frozen:
            raise ConfigError(f"cannot set {name!r}: config is frozen")
        self._fields[name] = value

    def __contains__(self, name: str) -> bool:
        return name in self._fields

    def __iter__(self) -> Iterator[str]:
        return iter(self._fields)

    def keys(self):
        return self._fields.keys()

    def items(self):
        return self._fields.items()

    def get(self, name: str, default: Any = None) -> Any:
        return self._fields.get(name, default)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, ConfigNode) and self.to_dict() == other.to_dict()

    def __repr__(self) -> str:
        return f"ConfigNode({self.to_dict()!r})"

    # -- lifecycle ---------------------------------------------------------
    def clone(self) -> "ConfigNode":
        node = ConfigNode()
        for k, v in self._fields.items():
            node[k] = v.clone() if isinstance(v, ConfigNode) else copy.deepcopy(v)
        return node

    def freeze(self) -> "ConfigNode":
        object.__setattr__(self, "_frozen", True)
        for v in self._fields.values():
            if isinstance(v, ConfigNode):
                v.freeze()
        return self

    def defrost(self) -> "ConfigNode":
        object.__setattr__(self, "_frozen", False)
        for v in self._fields.values():
            if isinstance(v, ConfigNode):
                v.defrost()
        return self

    @property
    def is_frozen(self) -> bool:
        return self._frozen

    def to_dict(self) -> Dict[str, Any]:
        return {
            k: (v.to_dict() if isinstance(v, ConfigNode) else v)
            for k, v in self._fields.items()
        }

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=True)

    # -- merging -----------------------------------------------------------
    def merge_from_dict(self, other: Dict[str, Any], _path: str = "") -> None:
        if self._frozen:
            raise ConfigError("cannot merge into a frozen config")
        for k, v in other.items():
            full = f"{_path}.{k}" if _path else k
            if k not in self._fields:
                raise ConfigError(f"unknown config key: {full!r}")
            cur = self._fields[k]
            if isinstance(cur, ConfigNode):
                if not isinstance(v, dict):
                    raise ConfigError(f"{full!r}: expected mapping, got {type(v).__name__}")
                cur.merge_from_dict(v, full)
            else:
                self._fields[k] = _coerce(cur, v, full)

    def merge_from_file(self, path: str) -> None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        self.merge_from_dict(data)

    def merge_from_list(self, opts) -> None:
        """Merge from a flat [KEY, value, KEY, value, ...] list (CLI override)."""
        if len(opts) % 2 != 0:
            raise ConfigError("override list must have even length")
        for key, val in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise ConfigError(f"unknown config key: {key!r}")
            if isinstance(val, str):
                val = yaml.safe_load(val)
            node[leaf] = _coerce(node[leaf], val, key)

    def validate(self, valid_values: Dict[str, list]) -> None:
        """Raise unless each listed key holds one of its allowed values
        (reference: experiment_config.py:9-10,37-39)."""
        for k, allowed in valid_values.items():
            if self[k] not in allowed:
                raise ConfigError(f"invalid value for {k!r}: {self[k]!r} not in {allowed}")


def _coerce(default: Any, value: Any, path: str) -> Any:
    """Type-check a merged value against the default (yacs-compatible rules)."""
    if default is None or value is None:
        return value
    dt, vt = type(default), type(value)
    if dt is vt:
        return value
    if dt is float and vt is int:
        return float(value)
    if dt is int and vt is float and float(value).is_integer():
        return int(value)
    if dt is tuple and vt is list:
        return tuple(value)
    if dt is list and vt is tuple:
        return list(value)
    raise ConfigError(
        f"{path!r}: type mismatch (default {dt.__name__}, got {vt.__name__} {value!r})"
    )


def load_with_inherit(path: str, defaults: ConfigNode, inherit_key: str = "INHERIT") -> ConfigNode:
    """Load a YAML config that may chain parent files via an INHERIT key.

    Mirrors the eval-config loader semantics of the reference
    (/root/reference/evaluation/policy_defaults.py:129-145): the inheritance
    chain is resolved root-first, children override parents, and relative
    INHERIT paths resolve against the including file's directory.
    """
    chain = []
    seen = set()
    cur = os.path.abspath(path)
    while cur:
        if cur in seen:
            raise ConfigError(f"INHERIT cycle at {cur}")
        seen.add(cur)
        with open(cur) as f:
            data = yaml.safe_load(f) or {}
        parent = data.pop(inherit_key, None)
        chain.append(data)
        cur = os.path.normpath(os.path.join(os.path.dirname(cur), parent)) if parent else None
    cfg = defaults.clone()
    for data in reversed(chain):
        cfg.merge_from_dict(data)
    return cfg
