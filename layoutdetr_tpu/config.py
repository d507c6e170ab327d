"""Config utilities: attribute dicts and string-keyed dynamic construction.

TPU-native equivalent of the reference's dnnlib config/DI system
(reference: dnnlib/util.py:41-54 ``EasyDict``, :288-304
``construct_class_by_name``). The reference drives its entire training
stack through a nested EasyDict tree whose ``class_name`` strings are
resolved at run time; we keep that public surface (training_options.json
round-trips between the two frameworks) while backing it with plain
Python — no pickling of live modules is ever required because model
state lives in JAX pytrees.
"""

from __future__ import annotations

import importlib
import json
import types
from typing import Any


class EasyDict(dict):
    """dict with attribute access. Mirrors dnnlib.util.EasyDict semantics."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


def get_obj_by_name(name: str) -> Any:
    """Resolve a dotted ``module.attr`` path to a Python object.

    Equivalent surface to dnnlib.util.get_obj_by_name (dnnlib/util.py:274).
    """
    parts = name.split(".")
    for i in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:i])
        try:
            module = importlib.import_module(module_name)
        except ImportError:
            continue
        obj: Any = module
        try:
            for attr in parts[i:]:
                obj = getattr(obj, attr)
            return obj
        except AttributeError:
            continue
    raise ImportError(f"cannot resolve object by name: {name!r}")


def call_func_by_name(*args, func_name: str, **kwargs) -> Any:
    return get_obj_by_name(func_name)(*args, **kwargs)


def construct_class_by_name(*args, class_name: str, **kwargs) -> Any:
    """Instantiate ``class_name`` with kwargs (dnnlib/util.py:294-304)."""
    return get_obj_by_name(class_name)(*args, **kwargs)


def _to_jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    if isinstance(obj, types.FunctionType):
        return f"{obj.__module__}.{obj.__qualname__}"
    return repr(obj)


def dump_config(cfg: dict, path: str) -> None:
    """Serialize a config tree to JSON (reference: train.py:90-91)."""
    with open(path, "w") as f:
        json.dump(_to_jsonable(cfg), f, indent=2)


def load_config(path: str) -> EasyDict:
    with open(path) as f:
        return json.load(f, object_hook=lambda d: EasyDict(d))
