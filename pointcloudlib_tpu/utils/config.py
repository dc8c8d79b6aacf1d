"""Dataclass config system with text-file round-trip.

Replaces the reference's class-attribute Config hierarchy and its
``parameters.txt`` load/save (datasets/ModelNet40.py:951-1298) with one
dataclass tree: ``save_config``/``load_config`` round-trip any frozen
dataclass (ints, floats, strs, bools, and tuples thereof) through the
same ``key = value`` text format, so checkpoints stay human-readable.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Type, TypeVar

T = TypeVar("T")


def _fmt(v: Any) -> str:
    if isinstance(v, (tuple, list)):
        return "[" + ", ".join(_fmt(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _parse(raw: str, typ: Any) -> Any:
    raw = raw.strip()
    if raw == "None":
        return None
    origin = getattr(typ, "__origin__", None)
    if origin is not None and str(origin) == "typing.Union":
        # Optional[T]: parse against the non-None member
        inner = [a for a in typ.__args__ if a is not type(None)]
        return _parse(raw, inner[0]) if inner else None
    if origin in (tuple, list):
        inner = raw.strip("[]")
        items = [s.strip() for s in inner.split(",") if s.strip()]
        args = typ.__args__
        elt = args[0]
        out = [_parse(s, elt) for s in items]
        return tuple(out) if origin is tuple else out
    if typ is bool:
        # accept the Python spellings a human editor will type; reject
        # anything else loudly instead of silently parsing as False
        low = raw.lower()
        if low not in ("true", "false", "1", "0"):
            raise ValueError(f"not a boolean: {raw!r}")
        return low in ("true", "1")
    if typ is int:
        return int(raw)
    if typ is float:
        return float(raw)
    if typ is str:
        return raw
    # fall back on literal guessing
    if raw in ("true", "false"):
        return raw == "true"
    for cast in (int, float):
        try:
            return cast(raw)
        except ValueError:
            pass
    return raw


def save_config(cfg: Any, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    lines = [f"# {type(cfg).__name__}"]
    for f in dataclasses.fields(cfg):
        lines.append(f"{f.name} = {_fmt(getattr(cfg, f.name))}")
    path.write_text("\n".join(lines) + "\n")


def load_config(cls: Type[T], path: str | Path) -> T:
    fields = {f.name: f for f in dataclasses.fields(cls)}
    overrides = {}
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, raw = line.split("=", 1)
        key = key.strip()
        if key in fields:
            overrides[key] = _parse(raw, fields[key].type_resolved
                                    if hasattr(fields[key], "type_resolved")
                                    else _resolve(cls, key))
    return cls(**overrides)


def _resolve(cls, name):
    import typing

    hints = typing.get_type_hints(cls)
    return hints[name]
