"""Compose — sequential transform runner.

Reference: ``/root/reference/codes/datasets/pipelines/compose.py:9-36``.
A transform returning ``None`` aborts the sample (decode-failure signal)."""

from __future__ import annotations

from typing import Callable, List, Sequence, Union

from ..registry import build_from_cfg
from .builder import PIPELINES


class Compose:
    def __init__(self, transforms: Sequence[Union[dict, Callable]]):
        assert isinstance(transforms, Sequence)
        self.transforms: List[Callable] = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(build_from_cfg(t, PIPELINES))
            elif callable(t):
                self.transforms.append(t)
            else:
                raise TypeError(f'transform must be callable or dict, got {t}')

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results

    def __repr__(self):
        return f'{type(self).__name__}({self.transforms})'
