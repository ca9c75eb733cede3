"""Model registries and build functions.

Mirror of the reference's five registries
(``/root/reference/codes/models/builder.py:6-47``): RECOGNIZERS, BACKBONES,
HEADS, SPATIAL_TEMPORAL_MODULES, SEGMENTAL_CONSENSUSES. Entries are Flax
module classes; ``build_*`` returns constructed (but un-initialized) modules.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from ..registry import Registry, build_from_cfg

RECOGNIZERS = Registry('recognizer')
BACKBONES = Registry('backbone')
HEADS = Registry('head')
SPATIAL_TEMPORAL_MODULES = Registry('spatial_temporal_module')
SEGMENTAL_CONSENSUSES = Registry('segmental_consensus')


def build_backbone(cfg: Dict[str, Any]):
    return build_from_cfg(cfg, BACKBONES)


def build_head(cfg: Dict[str, Any]):
    return build_from_cfg(cfg, HEADS)


def build_spatial_temporal_module(cfg: Dict[str, Any]):
    return build_from_cfg(cfg, SPATIAL_TEMPORAL_MODULES)


def build_segmental_consensus(cfg: Dict[str, Any]):
    return build_from_cfg(cfg, SEGMENTAL_CONSENSUSES)


def build_recognizer(cfg: Dict[str, Any],
                     train_cfg: Optional[Dict] = None,
                     test_cfg: Optional[Dict] = None):
    return build_from_cfg(
        cfg, RECOGNIZERS,
        default_args=dict(train_cfg=train_cfg, test_cfg=test_cfg))
