"""Lightweight config-dict registry.

The reference framework builds every object from python-dict configs through
mmcv ``Registry`` objects (see /root/reference/mogen/models/builder.py:5-37 and
/root/reference/mogen/datasets/builder.py:24-40).  We keep the same config
schema (``dict(type='STMoGenTransformer', ...)``) so reference configs port
nearly verbatim, but the registry itself is a ~60-line plain-python map — no
mmcv dependency, no metaclass magic, importable under jit tracing.
"""

from __future__ import annotations

import inspect
from collections.abc import Mapping
from typing import Any, Callable, Dict, Optional


class Registry:
    """Name -> constructor map with mmcv-compatible ``build`` semantics."""

    def __init__(self, name: str):
        self.name = name
        self._module_dict: Dict[str, Callable] = {}

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self) -> str:
        return f"Registry(name={self.name}, items={sorted(self._module_dict)})"

    def get(self, key: str) -> Optional[Callable]:
        return self._module_dict.get(key)

    def register_module(self, name: Optional[str] = None, module: Optional[Callable] = None):
        """Use as ``@REG.register_module()`` or ``REG.register_module(module=cls)``."""
        if module is not None:
            self._register(module, name)
            return module

        def _decorator(cls):
            self._register(cls, name)
            return cls

        return _decorator

    def _register(self, cls: Callable, name: Optional[str]):
        key = name or cls.__name__
        if key in self._module_dict and self._module_dict[key] is not cls:
            raise KeyError(f"{key} already registered in {self.name}")
        self._module_dict[key] = cls

    def build(self, cfg: Optional[dict], **default_kwargs) -> Any:
        """Instantiate from ``dict(type=..., **kwargs)``. None passes through."""
        if cfg is None:
            return None
        if not isinstance(cfg, Mapping):
            raise TypeError(f"cfg must be a mapping, got {type(cfg)}")
        cfg = dict(cfg)
        obj_type = cfg.pop("type")
        if isinstance(obj_type, str):
            if obj_type not in self._module_dict:
                raise KeyError(f"{obj_type} is not registered in {self.name}; "
                               f"known: {sorted(self._module_dict)}")
            obj_cls = self._module_dict[obj_type]
        elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
            obj_cls = obj_type
        else:
            raise TypeError(f"type must be str or class, got {obj_type}")
        for k, v in default_kwargs.items():
            cfg.setdefault(k, v)
        return obj_cls(**cfg)


# One shared MODELS registry aliased per role, mirroring the reference layout
# (/root/reference/mogen/models/builder.py:5-11).
MODELS = Registry("models")
LOSSES = MODELS
ARCHITECTURES = MODELS
SUBMODULES = MODELS
ATTENTIONS = MODELS

DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
EVALUATORS = Registry("evaluators")


def build_architecture(cfg):
    return ARCHITECTURES.build(cfg)


def build_submodule(cfg):
    return SUBMODULES.build(cfg)


def build_attention(cfg):
    return ATTENTIONS.build(cfg)


def build_loss(cfg):
    return LOSSES.build(cfg)


def build_dataset(cfg):
    return DATASETS.build(cfg)
