"""Decorator plugin registries with lazy import-on-resolve.

Parity: reference ``cmad/io/registry.py:54-213``. Registration happens at
class definition via decorators; resolution imports the conventional module
(``cmad_tpu.models.<name>`` etc.) on demand so importing the io layer has
no model-import side effects. Names are discoverable without import through
the schema-fragment convention (``cmad_tpu/io/schemas/<kind>/<name>.yaml``).
"""
from __future__ import annotations

import importlib
from collections.abc import Callable
from pathlib import Path

_MODEL_REGISTRY: dict[str, type] = {}
_QOI_REGISTRY: dict[str, type] = {}
_GLOBAL_RESIDUAL_REGISTRY: dict[str, type] = {}

_SCHEMA_DIR = Path(__file__).parent / "schemas"


def _register(registry: dict[str, type], name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        registry[name] = cls
        return cls
    return deco


def _resolve(registry: dict[str, type], name: str, package: str,
             kind: str) -> type:
    if name not in registry:
        module = f"{package}.{name}"
        try:
            importlib.import_module(module)
        except ImportError as e:
            raise KeyError(
                f"no registered {kind} named {name!r} "
                f"(import of {module} failed: {e})") from e
    try:
        return registry[name]
    except KeyError as e:
        raise KeyError(
            f"module for {kind} {name!r} imported but did not register "
            f"the name") from e


def _registered_names(registry: dict[str, type], subdir: str) -> list[str]:
    """Names discoverable without import: registered + schema fragments."""
    names = set(registry)
    frag_dir = _SCHEMA_DIR / subdir
    if frag_dir.is_dir():
        names.update(p.stem for p in frag_dir.glob("*.yaml"))
    return sorted(names)


def register_model(name: str):
    return _register(_MODEL_REGISTRY, name)


def resolve_model(name: str) -> type:
    return _resolve(_MODEL_REGISTRY, name, "cmad_tpu.models", "model")


def registered_model_names() -> list[str]:
    return _registered_names(_MODEL_REGISTRY, "models")


def register_qoi(name: str):
    return _register(_QOI_REGISTRY, name)


def resolve_qoi(name: str) -> type:
    return _resolve(_QOI_REGISTRY, name, "cmad_tpu.qois", "qoi")


def registered_qoi_names() -> list[str]:
    return _registered_names(_QOI_REGISTRY, "qois")


def register_global_residual(name: str):
    return _register(_GLOBAL_RESIDUAL_REGISTRY, name)


def resolve_global_residual(name: str) -> type:
    return _resolve(_GLOBAL_RESIDUAL_REGISTRY, name,
                    "cmad_tpu.global_residuals", "global residual")


def registered_global_residual_names() -> list[str]:
    return _registered_names(_GLOBAL_RESIDUAL_REGISTRY, "global_residuals")
