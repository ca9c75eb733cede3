"""String-keyed registries + config-dict builders.

TPU-native re-design of the reference's DI backbone
(``/root/reference/codes/utils/registry.py:7-81``): components register under a
string name and are instantiated from ``dict(type='Name', **kwargs)`` nodes.
Unlike the reference (which builds torch ``nn.Module`` objects), entries here
are typically Flax module classes or plain factory callables — the registry is
framework-agnostic.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """A name -> callable registry.

    Mirrors the public behavior of the reference Registry: ``register_module``
    usable as a decorator (with or without parens), duplicate registration is
    an error, lookup via ``get`` returns ``None`` for unknown keys.
    """

    def __init__(self, name: str):
        self._name = name
        self._module_dict: Dict[str, Callable] = {}

    @property
    def name(self) -> str:
        return self._name

    @property
    def module_dict(self) -> Dict[str, Callable]:
        return self._module_dict

    def __len__(self) -> int:
        return len(self._module_dict)

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self) -> str:
        return (f'{self.__class__.__name__}(name={self._name}, '
                f'items={list(self._module_dict)})')

    def get(self, key: str) -> Optional[Callable]:
        return self._module_dict.get(key)

    def register_module(self, cls: Optional[Callable] = None, *,
                        name: Optional[str] = None, force: bool = False):
        """Register a class/callable. Usable as ``@REG.register_module`` or
        ``@REG.register_module(name='Alias')``."""
        if cls is None:
            return lambda c: self.register_module(c, name=name, force=force)
        key = name if name is not None else cls.__name__
        if not force and key in self._module_dict:
            raise KeyError(f'{key} is already registered in {self._name}')
        self._module_dict[key] = cls
        return cls


def build_from_cfg(cfg: Dict[str, Any], registry: Registry,
                   default_args: Optional[Dict[str, Any]] = None) -> Any:
    """Instantiate ``registry[cfg['type']](**cfg_without_type, **default_args)``.

    Semantics match the reference ``build_from_cfg``
    (``codes/utils/registry.py:53-81``): ``cfg['type']`` may be a string key or
    a callable; ``default_args`` fill in missing kwargs only.
    """
    if not isinstance(cfg, dict) or 'type' not in cfg:
        raise TypeError(f'cfg must be a dict with a "type" key, got {cfg!r}')
    args = dict(cfg)
    obj_type = args.pop('type')
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f'{obj_type} is not in the {registry.name} registry')
    elif inspect.isclass(obj_type) or callable(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f'type must be a str or callable, got {type(obj_type)}')
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    return obj_cls(**args)
