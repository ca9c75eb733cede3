"""I3D classification head for (N, T, H, W, C) features.

Reference: ``/root/reference/codes/models/heads/i3d_clshead.py`` and
``i3d_slowfast_clshead.py``. The fcn-testing lazy Conv3d trick reduces to
pool-then-FC (1x1x1 conv is linear per position — see tsn_head.py note).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..builder import HEADS


@HEADS.register_module
class I3DClsHead(nn.Module):
    spatial_type: str = 'avg'
    spatial_size: int = 7
    temporal_size: int = 4
    consensus_cfg: Optional[Dict] = None
    dropout_ratio: float = 0.5
    in_channels: int = 2048
    num_classes: int = 400
    init_std: float = 0.01
    fcn_testing: bool = False
    extract_feat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_seg: int = 1,
                 train: bool = False) -> jnp.ndarray:
        # x: (M, T, H, W, C)
        if self.spatial_type == 'avg' or self.fcn_testing:
            feat = jnp.mean(x, axis=(1, 2, 3))
        elif self.spatial_type == 'max':
            feat = jnp.max(x, axis=(1, 2, 3))
        else:
            raise ValueError(self.spatial_type)
        if not self.fcn_testing and self.dropout_ratio:
            feat = nn.Dropout(rate=self.dropout_ratio,
                              deterministic=not train)(feat)
        if self.extract_feat:
            return feat

        def fc_init(key, shape, dtype=jnp.float32):
            return self.init_std * jnp.asarray(
                nn.initializers.normal(1.0)(key, shape, dtype))

        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=jnp.float32, kernel_init=fc_init,
                        bias_init=nn.initializers.zeros, name='fc')(feat)

    @staticmethod
    def loss(cls_score: jnp.ndarray, labels: jnp.ndarray) -> Dict:
        # at-least-f32: bf16 promotes, f64 stays (trajectory parity)
        logp = jax.nn.log_softmax(
            cls_score.astype(jnp.promote_types(jnp.float32,
                                               cls_score.dtype)), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return {'loss_cls': jnp.mean(nll)}


@HEADS.register_module
class I3DSlowFastClsHead(nn.Module):
    """Concats slow+fast pooled features (reference
    ``i3d_slowfast_clshead.py:8-49``). Input: tuple of two (M,T,H,W,C)."""
    spatial_type: str = 'avg'
    spatial_size: int = 7
    temporal_size: int = 4
    dropout_ratio: float = 0.5
    in_channels: int = 2048 + 256
    num_classes: int = 400
    init_std: float = 0.01
    fcn_testing: bool = False
    extract_feat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Tuple[jnp.ndarray, jnp.ndarray], num_seg: int = 1,
                 train: bool = False) -> jnp.ndarray:
        slow, fast = x
        feat = jnp.concatenate(
            [jnp.mean(slow, axis=(1, 2, 3)), jnp.mean(fast, axis=(1, 2, 3))],
            axis=-1)
        if not self.fcn_testing and self.dropout_ratio:
            feat = nn.Dropout(rate=self.dropout_ratio,
                              deterministic=not train)(feat)
        if self.extract_feat:
            return feat

        def fc_init(key, shape, dtype=jnp.float32):
            return self.init_std * jnp.asarray(
                nn.initializers.normal(1.0)(key, shape, dtype))

        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=jnp.float32, kernel_init=fc_init,
                        bias_init=nn.initializers.zeros, name='fc')(feat)

    loss = staticmethod(I3DClsHead.loss)
