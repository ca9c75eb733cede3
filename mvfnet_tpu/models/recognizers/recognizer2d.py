"""Recognizer2D — 2-D backbone over folded frames, TSN-style head.

Reference: ``/root/reference/codes/models/recognizers/recognizer2d.py`` and
``base.py``. Execution model preserved:

- train: ``(B, S, H, W, C) -> (B*S, H, W, C)`` through the backbone, head
  consensus over ``S // temporal_pool`` segments, cross-entropy loss
  (``recognizer2d.py:132-149``)
- test: all crops*clips*frames folded into one batch; with ``fcn_testing``
  the per-frame feature maps are regrouped into ``(clips*crops, T, h, w, C)``
  volumes and the head averages class maps over (T,H,W)
  (``recognizer2d.py:151-175``); clip averaging per ``test_cfg['average_clips']``
  ('prob' = softmax-then-mean, 'score' = mean, reference ``base.py:43-74``)
- Flow/RGBDiff modality changes the stem conv input channels; weight
  inflation from an RGB checkpoint (mean over in-channel then broadcast,
  reference ``recognizer2d.py:103-130``) is performed by the checkpoint
  loader at import time, not by module surgery.

Temporal-module insertion is declarative: the builder moves ``module_cfg``
into the backbone's ``temporal_cfg/temporal_freq`` fields.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..builder import (RECOGNIZERS, build_backbone, build_head)


def _prepare_backbone_cfg(backbone: Dict, module_cfg: Optional[Dict],
                          modality: str,
                          nonlocal_cfg: Optional[Dict] = None) -> Dict:
    """Translate the reference's (backbone, module_cfg, modality,
    nonlocal_cfg) surgery inputs into a single declarative backbone config."""
    backbone = dict(backbone)
    if nonlocal_cfg:
        backbone['nonlocal_cfg'] = dict(nonlocal_cfg)
    if module_cfg:
        module_cfg = dict(module_cfg)
        mtype = module_cfg.pop('type')
        if backbone.get('type') == 'MobileNetV2':
            # MVF/TSM inserted in identity InvertedResiduals
            # (recognizer2d.py:71-100); no per-stage freq mask.
            module_cfg.pop('mvf_freq', None)
            module_cfg.pop('shift_place', None)
            module_cfg.pop('temporal_pool', None)
            module_cfg.pop('two_path', None)
            backbone['temporal_cfg'] = dict(type=mtype, **module_cfg)
        elif mtype in ('MVF', 'CoST'):
            # MVF calls it mvf_freq (MVF.py:19), CoST shift_freq (CoST.py:20)
            freq = module_cfg.pop('mvf_freq',
                                  module_cfg.pop('shift_freq', (1, 1, 1, 1)))
            for k in ('place', 'temporal_pool', 'two_path'):
                module_cfg.pop(k, None)  # CoST no-op knobs (CoST.py:19-20)
            backbone['temporal_cfg'] = dict(type=mtype, **module_cfg)
            backbone['temporal_freq'] = tuple(freq)
        else:
            raise NotImplementedError(f'module type {mtype}')
    if modality == 'Flow':
        backbone['in_channels'] = 2 * 5
    elif modality == 'RGBDiff':
        backbone['in_channels'] = 3 * 5
    return backbone


@RECOGNIZERS.register_module
class Recognizer2D(nn.Module):
    backbone: Dict
    cls_head: Dict
    modality: str = 'RGB'
    fcn_testing: bool = False
    module_cfg: Optional[Dict] = None
    nonlocal_cfg: Optional[Dict] = None
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        bb_cfg = _prepare_backbone_cfg(self.backbone, self.module_cfg,
                                       self.modality, self.nonlocal_cfg)
        bb_cfg.setdefault('dtype', self.dtype)
        head_cfg = dict(self.cls_head)
        head_cfg.setdefault('dtype', self.dtype)
        head_cfg.setdefault('fcn_testing', self.fcn_testing)
        self.backbone_mod = build_backbone(bb_cfg)
        self.head_mod = build_head(head_cfg)

    @property
    def in_channels(self) -> int:
        return {'RGB': 3, 'Flow': 10, 'RGBDiff': 15}[self.modality]

    def extract_feat(self, imgs: jnp.ndarray, train: bool) -> jnp.ndarray:
        return self.backbone_mod(imgs, train=train)

    def __call__(self, imgs: jnp.ndarray, labels: Optional[jnp.ndarray] = None,
                 return_loss: bool = True, train: bool = False):
        if return_loss:
            return self.forward_train(imgs, labels, train=train)
        return self.forward_test(imgs)

    def forward_train(self, imgs: jnp.ndarray, labels: jnp.ndarray,
                      train: bool = True) -> Dict[str, jnp.ndarray]:
        # imgs: (B, S, H, W, C)
        num_batch = imgs.shape[0]
        imgs = imgs.reshape((-1,) + imgs.shape[2:])
        num_seg = imgs.shape[0] // num_batch
        x = self.extract_feat(imgs, train=train)
        temporal_pool = imgs.shape[0] // x.shape[0]
        cls_score = self.head_mod(x, num_seg // temporal_pool, train=train)
        labels = labels.reshape(-1)
        return self.head_mod.loss(cls_score, labels)

    def forward_test(self, imgs: jnp.ndarray) -> jnp.ndarray:
        # imgs: (B, crops*clips*T, H, W, C), B is typically 1.
        num_batch = imgs.shape[0]
        imgs = imgs.reshape((-1,) + imgs.shape[2:])
        num_frames = imgs.shape[0] // num_batch
        x = self.extract_feat(imgs, train=False)
        temporal_pool = imgs.shape[0] // x.shape[0]
        if self.module_cfg:
            n_seg = self.module_cfg['n_segment'] // temporal_pool
            if self.fcn_testing:
                # (M, h, w, C) -> (M/T, T, h, w, C) clip volumes.
                x = x.reshape((-1, n_seg) + x.shape[1:])
                cls_score = self.head_mod(x, n_seg)
            else:
                cls_score = self.head_mod(x, n_seg)
        else:
            cls_score = self.head_mod(x, num_frames // temporal_pool)
        return self.average_clip(cls_score, num_batch)

    def forward_extract_feat(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """Feature-extraction path (reference ``feature_extractor.py``):
        head returns pooled features instead of logits."""
        num_batch = imgs.shape[0]
        imgs = imgs.reshape((-1,) + imgs.shape[2:])
        x = self.extract_feat(imgs, train=False)
        temporal_pool = imgs.shape[0] // x.shape[0]
        if self.module_cfg and self.fcn_testing:
            n_seg = self.module_cfg['n_segment'] // temporal_pool
            x = x.reshape((-1, n_seg) + x.shape[1:])
            return jnp.mean(x, axis=(1, 2, 3))
        return jnp.mean(x, axis=(1, 2))

    def average_clip(self, cls_score: jnp.ndarray,
                     num_batch: int = 1) -> jnp.ndarray:
        """Per-video clip averaging (reference ``base.py:43-74``). The
        reference only supports one video per step (``videos_per_gpu=1`` at
        test); here the clip axis is regrouped per video so eval can batch —
        identical math when num_batch == 1."""
        test_cfg = self.test_cfg or {'average_clips': None}
        if 'average_clips' not in test_cfg:
            raise KeyError('"average_clips" must be defined in test_cfg')
        mode = test_cfg['average_clips']
        if mode not in ['score', 'prob', None]:
            raise ValueError(f'{mode} is not supported')
        if mode is None:
            return cls_score
        grouped = cls_score.reshape((num_batch, -1) + cls_score.shape[1:])
        if mode == 'prob':
            # softmax in >= f32 (bf16 compute would lose probability mass);
            # promote, never demote — an f32 hard cast here blocked the f64
            # reference-oracle parity path (same bug class as the round-4
            # trajectory fixes)
            acc = jnp.promote_types(grouped.dtype, jnp.float32)
            return jnp.mean(jax.nn.softmax(grouped.astype(acc), axis=-1),
                            axis=1)
        return jnp.mean(grouped, axis=1)
