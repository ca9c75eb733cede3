"""BN-Inception backbone (classic TSN 2-D backbone), channels-last Flax.

Reference: ``/root/reference/codes/models/backbones/bninception.py`` — a
caffe-converted hand-coded graph. Rebuilt data-driven: one generic
inception-block module consuming a per-block channel table (extracted from
the reference's layer definitions; the architecture facts of public
BN-Inception). Caffe-conversion quirks preserved:

- convs have biases; BN is torch ``momentum=0.9`` (i.e. new-stats weight
  0.9 -> flax momentum 0.1)
- branch concat uses post-ReLU activations (the reference concatenates
  ``*_bn_out`` tensors mutated in place by ReLU(inplace))
- stem/reduction max pools use ceil_mode; 5b's pool branch is a 3x3/s1 max
  pool, others avg
- concat order: [1x1, 3x3, double_3x3_2, pool(_proj)]; reduction blocks
  (3c, 4e) drop the 1x1 branch and use an unprojected s2 max pool
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..common import TorchBatchNorm, conv2d

Dtype = Any

# (name, 1x1, 3x3_reduce, 3x3, dbl_reduce, dbl_1, dbl_2, pool, proj, stride)
_BLOCKS = (
    ('3a', 64, 64, 64, 64, 96, 96, 'avg', 32, 1),
    ('3b', 64, 64, 96, 64, 96, 96, 'avg', 64, 1),
    ('3c', 0, 128, 160, 64, 96, 96, 'max', 0, 2),
    ('4a', 224, 64, 96, 96, 128, 128, 'avg', 128, 1),
    ('4b', 192, 96, 128, 96, 128, 128, 'avg', 128, 1),
    ('4c', 160, 128, 160, 128, 160, 160, 'avg', 128, 1),
    ('4d', 96, 128, 192, 160, 192, 192, 'avg', 128, 1),
    ('4e', 0, 128, 192, 192, 256, 256, 'max', 0, 2),
    ('5a', 352, 192, 320, 160, 224, 224, 'avg', 128, 1),
    ('5b', 352, 192, 320, 192, 224, 224, 'max', 128, 1),
)

_BN_MOMENTUM = 0.1  # torch BatchNorm2d(momentum=0.9) -> old-stats weight 0.1


def _ceil_max_pool(x, window=3, stride=2):
    """torch MaxPool2d(3, 2, ceil_mode=True) on NHWC."""
    h, w = x.shape[1], x.shape[2]
    pad_h = (-(h - window)) % stride if h > window else 0
    pad_w = (-(w - window)) % stride if w > window else 0
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((0, pad_h), (0, pad_w)))


class _ConvBN(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_ra: bool):
        x = conv2d(self.features, self.kernel, stride=self.stride,
                   padding=self.padding, use_bias=True, name='conv',
                   dtype=self.dtype)(x)
        x = TorchBatchNorm(momentum=_BN_MOMENTUM, epsilon=1e-5,
                           dtype=self.dtype, name='bn')(x, use_running_average=use_ra)
        return nn.relu(x)


class _InceptionBlock(nn.Module):
    c1x1: int
    reduce3: int
    c3x3: int
    dreduce: int
    d1: int
    d2: int
    pool: str
    proj: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_ra: bool):
        branches = []
        if self.c1x1:
            branches.append(
                _ConvBN(self.c1x1, 1, dtype=self.dtype, name='b1x1')(
                    x, use_ra))
        b3 = _ConvBN(self.reduce3, 1, dtype=self.dtype, name='b3_reduce')(
            x, use_ra)
        b3 = _ConvBN(self.c3x3, 3, stride=self.stride, padding=1,
                     dtype=self.dtype, name='b3')(b3, use_ra)
        branches.append(b3)
        bd = _ConvBN(self.dreduce, 1, dtype=self.dtype, name='bd_reduce')(
            x, use_ra)
        bd = _ConvBN(self.d1, 3, padding=1, dtype=self.dtype,
                     name='bd1')(bd, use_ra)
        bd = _ConvBN(self.d2, 3, stride=self.stride, padding=1,
                     dtype=self.dtype, name='bd2')(bd, use_ra)
        branches.append(bd)
        if self.stride == 2:
            bp = _ceil_max_pool(x, 3, 2)
        else:
            if self.pool == 'avg':
                bp = nn.avg_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)),
                                 count_include_pad=True)
            else:
                bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
            bp = _ConvBN(self.proj, 1, dtype=self.dtype, name='bpool_proj')(
                bp, use_ra)
        branches.append(bp)
        return jnp.concatenate(branches, axis=-1)


@BACKBONES.register_module
class BNInception(nn.Module):
    pretrained: Optional[str] = None
    bn_eval: bool = True
    bn_frozen: bool = False
    partial_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.bn_eval
        x = _ConvBN(64, 7, stride=2, padding=3, dtype=self.dtype,
                    name='conv1_7x7_s2')(x, use_ra)
        x = _ceil_max_pool(x, 3, 2)
        x = _ConvBN(64, 1, dtype=self.dtype, name='conv2_3x3_reduce')(
            x, use_ra)
        x = _ConvBN(192, 3, padding=1, dtype=self.dtype, name='conv2_3x3')(
            x, use_ra)
        x = _ceil_max_pool(x, 3, 2)
        for (name, c1, r3, c3, rd, d1, d2, pool, proj, stride) in _BLOCKS:
            x = _InceptionBlock(
                c1x1=c1, reduce3=r3, c3x3=c3, dreduce=rd, d1=d1, d2=d2,
                pool=pool, proj=proj, stride=stride, dtype=self.dtype,
                name=f'inception_{name}')(x, use_ra)
        return x  # (N, 7, 7, 1024) for 224 input
