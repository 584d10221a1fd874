"""Immutable experiment configuration.

Replaces the reference's global mutable ``hparams`` dict
(``utils/commons/hparams.py:82`` in yerfor/Real3DPortrait) with an immutable,
hashable configuration tree that is threaded explicitly through the code.
The YAML semantics are kept (so experiment files read the same way):

* ``base_config:`` — a path or list of paths, loaded depth-first and merged
  (later files and the child override earlier values).
* dot-path CLI overrides — ``"a.b=1,c=string"``.
* a config snapshot is written next to checkpoints and reloaded at inference.

Unlike the reference there is no ambient global: models receive typed
dataclass configs derived from this tree, and training code passes the tree
around explicitly.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Mapping
from typing import Any, Iterator

import yaml


def _parse_scalar(v: str) -> Any:
    """Parse a CLI override value string into bool/int/float/list/str."""
    s = v.strip()
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    if s.lower() in ("none", "null"):
        return None
    if re.fullmatch(r"[+-]?\d+", s):
        return int(s)
    try:
        return float(s)
    except ValueError:
        pass
    if s.startswith("[") or s.startswith("{"):
        try:
            return yaml.safe_load(s)
        except yaml.YAMLError:
            pass
    return s


class FrozenConfig(Mapping):
    """An immutable nested mapping with attribute access.

    ``cfg.model.lr`` and ``cfg["model"]["lr"]`` are equivalent;
    ``cfg.get("k", default)`` works like dict.get.  Mutation raises;
    use :meth:`replace` to derive an updated copy.
    """

    __slots__ = ("_data",)

    def __init__(self, data: Mapping | None = None):
        d = {}
        for k, v in dict(data or {}).items():
            if isinstance(v, Mapping) and not isinstance(v, FrozenConfig):
                v = FrozenConfig(v)
            elif isinstance(v, list):
                v = tuple(FrozenConfig(x) if isinstance(x, Mapping) else x for x in v)
            d[str(k)] = v
        object.__setattr__(self, "_data", d)

    # Mapping interface
    def __getitem__(self, k: str) -> Any:
        return self._data[k]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, k) -> bool:
        return k in self._data

    def __getattr__(self, k: str) -> Any:
        try:
            return self._data[k]
        except KeyError:
            raise AttributeError(k) from None

    def __setattr__(self, k, v):
        raise TypeError("FrozenConfig is immutable; use .replace()")

    def __repr__(self) -> str:
        return f"FrozenConfig({self._data!r})"

    def __eq__(self, other) -> bool:
        if isinstance(other, FrozenConfig):
            return self._data == other._data
        if isinstance(other, Mapping):
            return self.to_dict() == dict(other)
        return NotImplemented

    def __hash__(self) -> int:
        return hash(json.dumps(self.to_dict(), sort_keys=True, default=str))

    def to_dict(self) -> dict:
        out = {}
        for k, v in self._data.items():
            if isinstance(v, FrozenConfig):
                v = v.to_dict()
            elif isinstance(v, tuple):
                v = [x.to_dict() if isinstance(x, FrozenConfig) else x for x in v]
            out[k] = v
        return out

    def replace(self, **updates) -> "FrozenConfig":
        """Return a copy with top-level keys replaced."""
        d = self.to_dict()
        d.update(updates)
        return FrozenConfig(d)

    def replace_dotted(self, dotted: Mapping[str, Any]) -> "FrozenConfig":
        """Return a copy with dot-path keys (``a.b.c``) replaced."""
        d = self.to_dict()
        for path, value in dotted.items():
            node = d
            parts = path.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = value
        return FrozenConfig(d)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        tmp = path + ".part"
        with open(tmp, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=True)
        os.replace(tmp, path)


def parse_overrides(spec: str) -> dict[str, Any]:
    """Parse ``"a.b=1,c=true,d=[1,2]"`` into a dot-path dict.

    Commas inside brackets/braces are respected (mirrors the override
    semantics of the reference ``utils/commons/hparams.py:18``).
    """
    out: dict[str, Any] = {}
    if not spec:
        return out
    depth = 0
    items, cur = [], []
    for ch in spec:
        if ch in "[{(":
            depth += 1
        elif ch in "]})":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        items.append("".join(cur))
    for item in items:
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(f"override {item!r} must look like key=value")
        k, v = item.split("=", 1)
        out[k.strip()] = _parse_scalar(v)
    return out


def _merge(base: dict, child: dict) -> dict:
    out = dict(base)
    for k, v in child.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml_with_bases(path: str, _seen: frozenset = frozenset()) -> dict:
    path = os.path.abspath(path)
    if path in _seen:
        raise ValueError(f"circular base_config chain at {path}")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    bases = raw.pop("base_config", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: dict = {}
    for b in bases:
        b_path = b if os.path.isabs(b) else os.path.join(os.path.dirname(path), b)
        merged = _merge(merged, _load_yaml_with_bases(b_path, _seen | {path}))
    return _merge(merged, raw)


def load_config(path: str, overrides: str | Mapping[str, Any] = "") -> FrozenConfig:
    """Load a YAML experiment config, resolving ``base_config`` inheritance."""
    cfg = FrozenConfig(_load_yaml_with_bases(path))
    if overrides:
        dotted = parse_overrides(overrides) if isinstance(overrides, str) else dict(overrides)
        cfg = cfg.replace_dotted(dotted)
    return cfg
