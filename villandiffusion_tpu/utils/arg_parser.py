"""Declarative dataclass -> argparse framework with JSON persistence.

Parity with /root/reference/arg_parser.py (ArgParser :25-200) + config.py:
dataclass fields carry argparse specs in their ``metadata``; configs load /
save / merge as JSON with the layering CLI > saved run config > defaults
(arg_parser.py:108-151,175-187).  Used by the measure/sampling wrappers the
same way the reference's measure.py:47-74 does.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Any, Dict, Optional, Type, TypeVar

T = TypeVar("T")


def arg(default: Any = None, type: Optional[type] = None, help: str = "",
        choices=None, export: bool = True, required: bool = False):
    """Field factory: declares an exported CLI flag on a config dataclass."""
    inferred = type if type is not None else (
        None if default is None else default.__class__
    )
    return dataclasses.field(
        default=default,
        metadata={
            "export": export,
            "type": inferred,
            "help": help,
            "choices": choices,
            "required": required,
        },
    )


class ArgParser:
    """Build an argparse parser from one or more config dataclasses; merge
    parsed CLI values over saved JSON configs over defaults."""

    def __init__(self, *config_classes: Type):
        self.config_classes = config_classes
        self.parser = argparse.ArgumentParser()
        for cls in config_classes:
            for f in dataclasses.fields(cls):
                meta = dict(f.metadata)
                if not meta.get("export", False):
                    continue
                kwargs: Dict[str, Any] = {"help": meta.get("help", "")}
                ftype = meta.get("type") or (
                    type(f.default) if f.default is not None else str
                )
                if ftype is bool:
                    kwargs["action"] = "store_true"
                    kwargs["default"] = None
                else:
                    kwargs["type"] = ftype
                    kwargs["default"] = None
                if meta.get("choices"):
                    kwargs["choices"] = meta["choices"]
                if meta.get("required"):
                    kwargs["required"] = True
                self.parser.add_argument(f"--{f.name}", **kwargs)

    def parse(self, cls: Type[T], argv=None, saved_json: Optional[str] = None) -> T:
        """defaults < saved_json < CLI (default_update_rule semantics)."""
        args = vars(self.parser.parse_args(argv))
        values: Dict[str, Any] = {}
        if saved_json and os.path.exists(saved_json):
            with open(saved_json) as f:
                saved = json.load(f)
            for f_ in dataclasses.fields(cls):
                if f_.name in saved and saved[f_.name] is not None:
                    values[f_.name] = saved[f_.name]
        for f_ in dataclasses.fields(cls):
            if args.get(f_.name) is not None:
                values[f_.name] = args[f_.name]
        return cls(**{
            k: v for k, v in values.items()
            if k in {f.name for f in dataclasses.fields(cls)}
        })

    @staticmethod
    def save(config, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=str)

    @staticmethod
    def load(cls: Type[T], path: str) -> T:
        with open(path) as f:
            data = json.load(f)
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in names})
