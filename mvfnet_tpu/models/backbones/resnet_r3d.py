"""R3D / R(2+1)D plain 3-D ResNets, channels-last Flax.

Reference: ``/root/reference/codes/models/backbones/resnet_r3d.py`` +
``resnet_r3d_utils.py``. Block types: '3d' (full 3x3x3), '2.5d'
(spatial 1x3x3 -> BN/ReLU -> temporal 3x1x1 with the paper's
middle-channel formula ``3*i*o*k^2 / (i*k^2 + 3*o)``), '0.3d' (1x1x1 then
full), '3d-sep' (depthwise). BN eps 1e-3 (caffe2 conversion), shallow/deep
filter configs, channel/bottleneck multipliers, optional pool1,
R(2+1)D decomposed stem (45-channel middle).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..builder import BACKBONES
from ..common import TorchBatchNorm
from .resnet_i3d import conv3d, max_pool3d

Dtype = Any

BLOCK_CONFIG = {
    10: (1, 1, 1, 1), 16: (2, 2, 2, 1), 18: (2, 2, 2, 2),
    26: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
    101: (3, 4, 23, 3), 152: (3, 8, 36, 3),
}
SHALLOW_FILTER_CONFIG = ((64, 64), (128, 128), (256, 256), (512, 512))
DEEP_FILTER_CONFIG = ((256, 64), (512, 128), (1024, 256), (2048, 512))

_BN_EPS = 1e-3


class _BN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_ra: bool):
        return TorchBatchNorm(momentum=0.9, epsilon=_BN_EPS,
                              dtype=self.dtype, name='bn')(
            x, use_running_average=use_ra)


class _Conv3DBlock(nn.Module):
    """add_conv3d equivalent: '3d' | '2.5d' | '0.3d' | '3d-sep'."""
    in_filters: int
    out_filters: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    pad: Tuple[int, int, int]
    block_type: str = '3d'
    with_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_ra: bool):
        use_bias = not self.with_bn
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        pt, ph, pw = self.pad
        if self.block_type == '2.5d':
            i = 3 * self.in_filters * self.out_filters * kh * kw
            i /= self.in_filters * kh * kw + 3 * self.out_filters
            mid = int(i)
            x = conv3d(mid, (1, kh, kw), (1, sh, sw), (0, ph, pw),
                       use_bias=use_bias, name='conv_s', dtype=self.dtype)(x)
            if self.with_bn:
                x = _BN(self.dtype, name='bn_s')(x, use_ra)
            x = nn.relu(x)
            return conv3d(self.out_filters, (kt, 1, 1), (st, 1, 1),
                          (pt, 0, 0), use_bias=use_bias, name='conv_t',
                          dtype=self.dtype)(x)
        if self.block_type == '0.3d':
            x = conv3d(self.out_filters, (1, 1, 1), use_bias=use_bias,
                       name='conv_T', dtype=self.dtype)(x)
            if self.with_bn:
                x = _BN(self.dtype, name='bn_T')(x, use_ra)
            x = nn.relu(x)
            return conv3d(self.out_filters, self.kernel, self.stride,
                          self.pad, use_bias=use_bias, name='conv_C',
                          dtype=self.dtype)(x)
        if self.block_type == '3d-sep':
            assert self.in_filters == self.out_filters
            return nn.Conv(self.out_filters, self.kernel,
                           strides=self.stride,
                           padding=tuple((p, p) for p in self.pad),
                           feature_group_count=self.in_filters,
                           use_bias=use_bias, dtype=self.dtype,
                           param_dtype=jnp.float32, name='conv')(x)
        return conv3d(self.out_filters, self.kernel, self.stride, self.pad,
                      use_bias=use_bias, name='conv', dtype=self.dtype)(x)


class R3DBasicBlock(nn.Module):
    input_filters: int
    num_filters: int
    base_filters: int
    down_sampling: bool = False
    down_sampling_temporal: Optional[bool] = None
    block_type: str = '3d'
    is_real_3d: bool = True
    with_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_ra: bool):
        dst = self.down_sampling_temporal
        if dst is None:
            dst = self.down_sampling
        if self.down_sampling:
            stride = (2, 2, 2) if (self.is_real_3d and dst) else (1, 2, 2)
        else:
            stride = (1, 1, 1)
        k = (3, 3, 3) if self.is_real_3d else (1, 3, 3)
        p = (1, 1, 1) if self.is_real_3d else (0, 1, 1)
        identity = x
        out = _Conv3DBlock(self.input_filters, self.num_filters, k, stride,
                           p, self.block_type, self.with_bn, self.dtype,
                           name='conv1')(x, use_ra)
        if self.with_bn:
            out = _BN(self.dtype, name='bn1')(out, use_ra)
        out = nn.relu(out)
        out = _Conv3DBlock(self.num_filters, self.num_filters, k, (1, 1, 1),
                           p, self.block_type, self.with_bn, self.dtype,
                           name='conv2')(out, use_ra)
        if self.with_bn:
            out = _BN(self.dtype, name='bn2')(out, use_ra)
        if self.down_sampling or self.num_filters != self.input_filters:
            identity = conv3d(self.num_filters, (1, 1, 1), stride,
                              use_bias=not self.with_bn, name='conv3',
                              dtype=self.dtype)(x)
            if self.with_bn:
                identity = _BN(self.dtype, name='bn3')(identity, use_ra)
        return nn.relu(out + identity)


class R3DBottleneck(nn.Module):
    input_filters: int
    num_filters: int
    base_filters: int
    down_sampling: bool = False
    down_sampling_temporal: Optional[bool] = None
    block_type: str = '3d'
    is_real_3d: bool = True
    with_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_ra: bool):
        dst = self.down_sampling_temporal
        if dst is None:
            dst = self.down_sampling
        if self.down_sampling:
            stride = (2, 2, 2) if (self.is_real_3d and dst) else (1, 2, 2)
        else:
            stride = (1, 1, 1)
        k = (3, 3, 3) if self.is_real_3d else (1, 3, 3)
        p = (1, 1, 1) if self.is_real_3d else (0, 1, 1)
        identity = x
        out = conv3d(self.base_filters, (1, 1, 1),
                     use_bias=not self.with_bn, name='conv0',
                     dtype=self.dtype)(x)
        if self.with_bn:
            out = _BN(self.dtype, name='bn0')(out, use_ra)
        out = nn.relu(out)
        out = _Conv3DBlock(self.base_filters, self.base_filters, k, stride,
                           p, self.block_type, self.with_bn, self.dtype,
                           name='conv1')(out, use_ra)
        if self.with_bn:
            out = _BN(self.dtype, name='bn1')(out, use_ra)
        out = nn.relu(out)
        out = conv3d(self.num_filters, (1, 1, 1),
                     use_bias=not self.with_bn, name='conv2',
                     dtype=self.dtype)(out)
        if self.with_bn:
            out = _BN(self.dtype, name='bn2')(out, use_ra)
        if self.down_sampling or self.num_filters != self.input_filters:
            identity = conv3d(self.num_filters, (1, 1, 1), stride,
                              use_bias=not self.with_bn, name='conv3',
                              dtype=self.dtype)(x)
            if self.with_bn:
                identity = _BN(self.dtype, name='bn3')(identity, use_ra)
        return nn.relu(out + identity)


@BACKBONES.register_module
class ResNet_R3D(nn.Module):
    pretrained: Optional[str] = None
    num_input_channels: int = 3
    depth: int = 34
    block_type: str = '2.5d'
    channel_multiplier: float = 1.0
    bottleneck_multiplier: float = 1.0
    conv1_kernel_t: int = 3
    conv1_stride_t: int = 1
    use_pool1: bool = False
    bn_eval: bool = True
    bn_frozen: bool = True
    with_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.bn_eval
        if self.block_type in ('2.5d', '2.5d-sep'):
            x = conv3d(45, (1, 7, 7), (1, 2, 2), (0, 3, 3),
                       use_bias=not self.with_bn, name='conv1_s',
                       dtype=self.dtype)(x)
            if self.with_bn:
                x = _BN(self.dtype, name='bn1_s')(x, use_ra)
            x = nn.relu(x)
            x = conv3d(64, (self.conv1_kernel_t, 1, 1),
                       (self.conv1_stride_t, 1, 1),
                       ((self.conv1_kernel_t - 1) // 2, 0, 0),
                       use_bias=not self.with_bn, name='conv1_t',
                       dtype=self.dtype)(x)
            if self.with_bn:
                x = _BN(self.dtype, name='bn1_t')(x, use_ra)
            x = nn.relu(x)
        else:
            x = conv3d(64, (self.conv1_kernel_t, 7, 7),
                       (self.conv1_stride_t, 2, 2),
                       ((self.conv1_kernel_t - 1) // 2, 3, 3),
                       use_bias=not self.with_bn, name='conv1',
                       dtype=self.dtype)(x)
            if self.with_bn:
                x = _BN(self.dtype, name='bn1')(x, use_ra)
            x = nn.relu(x)
        if self.use_pool1:
            x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))

        stage_blocks = BLOCK_CONFIG[self.depth]
        block_cls = (R3DBasicBlock if self.depth <= 18 or self.depth == 34
                     else R3DBottleneck)
        filters = (SHALLOW_FILTER_CONFIG if self.depth <= 34
                   else DEEP_FILTER_CONFIG)
        filters = np.multiply(filters, self.channel_multiplier).astype(int)
        in_f = 64
        for i, num_blocks in enumerate(stage_blocks):
            num_f = int(filters[i][0])
            base_f = int(filters[i][1] * self.bottleneck_multiplier)
            for j in range(num_blocks):
                x = block_cls(
                    input_filters=in_f if j == 0 else num_f,
                    num_filters=num_f, base_filters=base_f,
                    down_sampling=(i > 0 and j == 0),
                    block_type=self.block_type,
                    with_bn=self.with_bn, dtype=self.dtype,
                    name=f'layer{i + 1}_{j}')(x, use_ra)
            in_f = num_f
        return x
