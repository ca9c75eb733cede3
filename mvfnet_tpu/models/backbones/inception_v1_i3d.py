"""I3D GoogLeNet (InceptionV1_I3D), channels-last Flax.

Reference: ``/root/reference/codes/models/backbones/inception_v1_i3d.py`` —
the original I3D inflation of GoogLeNet, hand-coded; rebuilt data-driven
from its per-block channel table (standard GoogLeNet Table-1 channels).
Quirks preserved:

- stem conv 7x7x7 stride 2 with TF-style *asymmetric* padding (2,4) on
  each of T/H/W (reference ``forward``: ``F.pad(input, (2,4,2,4,2,4))``)
- spatial-only stem pools (1,3,3)/(1,2,2) with ceil_mode; reduction pools
  3c (3,3,3)/(2,2,2) and 4f (2,2,2)/(2,2,2)
- all inception 3x3 branches are full 3x3x3; convs bias-free, BN eps 1e-5
- Flow modality switches the stem to 2 input channels
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..common import make_norm
from .resnet_i3d import conv3d

Dtype = Any

# (name, 1x1, b1_reduce, b1_3x3, b2_reduce, b2_3x3, pool_proj)
_BLOCKS_3 = (
    ('3a', 64, 96, 128, 16, 32, 32),
    ('3b', 128, 128, 192, 32, 96, 64),
)
_BLOCKS_4 = (
    ('4a', 192, 96, 208, 16, 48, 64),
    ('4b', 160, 112, 224, 24, 64, 64),
    ('4c', 128, 128, 256, 24, 64, 64),
    ('4d', 112, 144, 288, 32, 64, 64),
    ('4e', 256, 160, 320, 32, 128, 128),
)
_BLOCKS_5 = (
    ('5a', 256, 160, 320, 32, 128, 128),
    ('5b', 384, 192, 384, 48, 128, 128),
)


def _ceil_max_pool3d(x, kernel, stride):
    dims = x.shape[1:4]
    extra = [(-(d - k)) % s if d > k else 0
             for d, k, s in zip(dims, kernel, stride)]
    return nn.max_pool(x, kernel, strides=stride,
                       padding=tuple((0, e) for e in extra))


class _ConvBN3D(nn.Module):
    features: int
    kernel: tuple = (1, 1, 1)
    stride: tuple = (1, 1, 1)
    padding: tuple = (0, 0, 0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_ra: bool):
        x = conv3d(self.features, self.kernel, self.stride, self.padding,
                   use_bias=False, name='conv', dtype=self.dtype)(x)
        x = make_norm({'type': 'BN3d'}, name='bn', dtype=self.dtype)(
            x, use_running_average=use_ra)
        return nn.relu(x)


class _InceptionBlock3D(nn.Module):
    c1x1: int
    b1r: int
    b1: int
    b2r: int
    b2: int
    proj: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_ra: bool):
        out1 = _ConvBN3D(self.c1x1, dtype=self.dtype, name='b1x1')(x, use_ra)
        b1 = _ConvBN3D(self.b1r, dtype=self.dtype, name='b1_reduce')(
            x, use_ra)
        b1 = _ConvBN3D(self.b1, (3, 3, 3), padding=(1, 1, 1),
                       dtype=self.dtype, name='b1_3x3')(b1, use_ra)
        b2 = _ConvBN3D(self.b2r, dtype=self.dtype, name='b2_reduce')(
            x, use_ra)
        b2 = _ConvBN3D(self.b2, (3, 3, 3), padding=(1, 1, 1),
                       dtype=self.dtype, name='b2_3x3')(b2, use_ra)
        bp = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1),
                         padding=((1, 1), (1, 1), (1, 1)))
        bp = _ConvBN3D(self.proj, dtype=self.dtype, name='pool_proj')(
            bp, use_ra)
        return jnp.concatenate([out1, b1, b2, bp], axis=-1)


@BACKBONES.register_module
class InceptionV1_I3D(nn.Module):
    pretrained: Optional[str] = None
    bn_eval: bool = True
    bn_frozen: bool = False
    partial_bn: bool = False
    modality: str = 'RGB'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, T, H, W, C) with C=3 (RGB) or 2 (Flow)."""
        assert self.modality in ('RGB', 'Flow')
        use_ra = (not train) or self.bn_eval
        # stem: TF-style asymmetric pad (2,4) per dim, 7^3 stride-2 conv
        x = jnp.pad(x, [(0, 0), (2, 4), (2, 4), (2, 4), (0, 0)])
        x = conv3d(64, (7, 7, 7), (2, 2, 2), (0, 0, 0), use_bias=False,
                   name='conv1_7x7_s2', dtype=self.dtype)(x)
        x = make_norm({'type': 'BN3d'}, name='conv1_bn', dtype=self.dtype)(
            x, use_running_average=use_ra)
        x = nn.relu(x)
        x = _ceil_max_pool3d(x, (1, 3, 3), (1, 2, 2))
        x = _ConvBN3D(64, dtype=self.dtype, name='conv2_3x3_reduce')(
            x, use_ra)
        x = _ConvBN3D(192, (3, 3, 3), padding=(1, 1, 1), dtype=self.dtype,
                      name='conv2_3x3')(x, use_ra)
        x = _ceil_max_pool3d(x, (1, 3, 3), (1, 2, 2))

        for (name, c1, b1r, b1, b2r, b2, proj) in _BLOCKS_3:
            x = _InceptionBlock3D(c1, b1r, b1, b2r, b2, proj,
                                  dtype=self.dtype,
                                  name=f'inception_{name}')(x, use_ra)
        x = _ceil_max_pool3d(x, (3, 3, 3), (2, 2, 2))
        for (name, c1, b1r, b1, b2r, b2, proj) in _BLOCKS_4:
            x = _InceptionBlock3D(c1, b1r, b1, b2r, b2, proj,
                                  dtype=self.dtype,
                                  name=f'inception_{name}')(x, use_ra)
        x = _ceil_max_pool3d(x, (2, 2, 2), (2, 2, 2))
        for (name, c1, b1r, b1, b2r, b2, proj) in _BLOCKS_5:
            x = _InceptionBlock3D(c1, b1r, b1, b2r, b2, proj,
                                  dtype=self.dtype,
                                  name=f'inception_{name}')(x, use_ra)
        return x  # (N, T/8, H/32, W/32, 1024)
