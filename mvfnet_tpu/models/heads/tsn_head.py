"""TSN classification head for 2-D features.

Reference: ``/root/reference/codes/models/heads/tsn_clshead.py``. The
reference's fcn-testing branch lazily converts the FC into a 1x1x1 Conv3d and
averages the class map over (T, H, W) (``tsn_clshead.py:99-117``); since a
1x1x1 conv is linear per position, ``mean(conv(x)) == fc(mean(x))`` — here
both paths share the pooled-FC math, with dropout only on the train path.

Input conventions (channels-last):
- standard path: ``(M, H, W, C)`` per-frame features, M = B*num_seg(*crops*clips)
- fcn path:      ``(M', T, H, W, C)`` clip feature volumes
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..builder import HEADS
from .consensus import SimpleConsensus, return_trn


@HEADS.register_module
class TSNClsHead(nn.Module):
    spatial_type: str = 'avg'
    spatial_size: int = 7
    consensus_cfg: Optional[Dict] = None
    with_avg_pool: bool = False
    temporal_feature_size: int = 1
    spatial_feature_size: int = 1
    dropout_ratio: float = 0.8
    in_channels: int = 1024
    num_classes: int = 101
    init_std: float = 0.001
    fcn_testing: bool = False
    extract_feat: bool = False
    dtype: Any = jnp.float32

    def _consensus_type(self) -> str:
        cfg = self.consensus_cfg or {'type': 'avg', 'dim': 1}
        return cfg['type']

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_seg: int,
                 train: bool = False) -> jnp.ndarray:
        ctype = self._consensus_type()
        fc_features = 256 if ctype in ('TRN', 'TRNmultiscale') else \
            self.num_classes

        def fc_init(key, shape, dtype=jnp.float32):
            return self.init_std * jnp.asarray(
                nn.initializers.normal(1.0)(key, shape, dtype))

        fc = nn.Dense(fc_features, dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=fc_init, bias_init=nn.initializers.zeros,
                      name='fc')

        if x.ndim == 5:
            # fcn-testing volume (M', T, H, W, C): average over T,H,W.
            feat = jnp.mean(x, axis=(1, 2, 3))
            if self.extract_feat:
                return feat
            return fc(feat)

        # Standard path: (M, H, W, C).
        if self.spatial_type == 'avg':
            feat = jnp.mean(x, axis=(1, 2))
        elif self.spatial_type == 'max':
            feat = jnp.max(x, axis=(1, 2))
        else:
            raise ValueError(self.spatial_type)
        if self.dropout_ratio and self.dropout_ratio > 0:
            feat = nn.Dropout(rate=self.dropout_ratio,
                              deterministic=not train)(feat)
        if self.extract_feat:
            return feat  # (M, C)

        if ctype == 'avg':
            score = fc(feat)                                  # (M, K)
            score = score.reshape((-1, num_seg) + score.shape[1:])
            score = SimpleConsensus(consensus_type='avg', dim=1)(score)
            return score[:, 0]                                # (M/num_seg, K)
        if ctype in ('TRN', 'TRNmultiscale'):
            emb = fc(feat)                                    # (M, 256)
            emb = emb.reshape((-1, num_seg, emb.shape[-1]))
            cfg = self.consensus_cfg or {}
            trn = return_trn(ctype, 256, cfg.get('num_frames', num_seg),
                             self.num_classes, dtype=self.dtype,
                             name='consensus')
            score = trn(emb)
            return score[:, 0]
        raise NotImplementedError(ctype)

    @staticmethod
    def loss(cls_score: jnp.ndarray, labels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Cross-entropy, matching reference ``heads/base.py:40-45``.

        Computed in at-least-f32 (bf16 logits promote; f64 stays f64 for
        the train-trajectory parity tests)."""
        logp = jax.nn.log_softmax(
            cls_score.astype(jnp.promote_types(jnp.float32,
                                               cls_score.dtype)), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return {'loss_cls': jnp.mean(nll)}
