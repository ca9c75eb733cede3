"""X3D backbone (unofficial, FLOPs-comparison variant), channels-last Flax.

Reference: ``/root/reference/codes/models/backbones/resnet_x3d.py`` — a
width/depth ratio-expanded 3-D ResNet: thin stem (24*ratio_width channels,
spatial conv1 + depthwise temporal 3x1x1), inverted-bottleneck stages
(expand to ``24*ratio_width*ratio_bottleneck*2^i``, depthwise-capable conv2,
SE + HardSwish, compress by ``1/ratio_bottleneck``), and a projection tail
(conv5 1x1 expand -> global avg pool -> fc1 1x1 to 2048).

Structural notes preserved from the reference: conv1 has *no* norm before
relu (``forward``, :646-651); pool2 (2,1,1 temporal maxpool) after stage 1.
Output: (N, 1, 1, 1, 2048) feature ready for I3DClsHead.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ...ops.mvf import hard_swish
from ..builder import BACKBONES
from ..common import SEModule, make_norm
from .resnet_i3d import conv3d, max_pool3d

Dtype = Any


class X3DBottleneck(nn.Module):
    """Reference ``resnet_x3d.py:116-281``."""
    inplanes: int
    planes: int
    out_channels: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    style: str = 'pytorch'
    if_inflate: bool = True
    inflate_style: str = 'mobile'
    norm_cfg: Optional[Dict] = None
    with_se: bool = True
    with_hs: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, norm_eval: bool = False):
        use_ra = (not train) or norm_eval
        act = hard_swish if self.with_hs else nn.relu
        ss, ts = self.spatial_stride, self.temporal_stride
        if self.style == 'pytorch':
            c1_s, c2_s, c1_t, c2_t = 1, ss, 1, ts
        else:
            c1_s, c2_s, c1_t, c2_t = ss, 1, ts, 1

        if self.if_inflate:
            if self.inflate_style == '3x1x1':
                k1, p1, k2, p2 = (3, 1, 1), (1, 0, 0), (1, 3, 3), \
                    (0, self.dilation, self.dilation)
            else:  # '3x3x3' / 'mobile'
                k1, p1, k2, p2 = (1, 1, 1), (0, 0, 0), (3, 3, 3), \
                    (1, self.dilation, self.dilation)
        else:
            k1, p1, k2, p2 = (1, 1, 1), (0, 0, 0), (1, 3, 3), \
                (0, self.dilation, self.dilation)
            c1_t = c2_t = 1

        identity = x
        out = conv3d(self.planes, k1, (c1_t, c1_s, c1_s), p1,
                     name='conv1', dtype=self.dtype)(x)
        out = make_norm(self.norm_cfg, name='bn1', dtype=self.dtype)(
            out, use_running_average=use_ra)
        out = act(out)
        depthwise = self.inflate_style == 'mobile' and self.if_inflate
        out = nn.Conv(self.planes, k2, strides=(c2_t, c2_s, c2_s),
                      padding=tuple((p, p) for p in p2),
                      kernel_dilation=(1, self.dilation, self.dilation),
                      feature_group_count=self.planes if depthwise else 1,
                      use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name='conv2')(out)
        out = make_norm(self.norm_cfg, name='bn2', dtype=self.dtype)(
            out, use_running_average=use_ra)
        if self.with_se:
            out = SEModule(self.planes, 16, self.with_hs, name='se',
                           dtype=self.dtype)(out)
        out = act(out)
        out = conv3d(self.out_channels, (1, 1, 1), name='conv3',
                     dtype=self.dtype)(out)
        out = make_norm(self.norm_cfg, name='bn3', dtype=self.dtype)(
            out, use_running_average=use_ra)
        if self.with_downsample:
            identity = conv3d(self.out_channels, (1, 1, 1), (ts, ss, ss),
                              name='downsample_conv', dtype=self.dtype)(x)
            identity = make_norm(self.norm_cfg, name='downsample_bn',
                                 dtype=self.dtype)(
                identity, use_running_average=use_ra)
        return nn.relu(out + identity)


@BACKBONES.register_module
class ResNet_X3D(nn.Module):
    depth: int
    in_channels: int = 3
    num_stages: int = 4
    spatial_strides: Sequence[int] = (1, 2, 2, 2)
    temporal_strides: Sequence[int] = (1, 1, 1, 1)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (3,)
    conv1_kernel: Tuple[int, int, int] = (5, 7, 7)
    ratio_width: float = 1
    ratio_up: float = 2
    ratio_bottleneck: float = 2.25
    ratio_depth: float = 2.2
    conv1_stride_t: int = 2
    pool1_kernel_t: int = 1
    pool1_stride_t: int = 2
    style: str = 'pytorch'
    frozen_stages: int = -1
    inflate_freq: Union[int, Sequence] = (1, 1, 1, 1)
    inflate_style: str = 'mobile'
    norm_cfg: Optional[Dict] = None
    no_pool2: bool = False
    norm_eval: bool = True
    norm_frozen: bool = False
    partial_norm: bool = False
    pretrained: Optional[str] = None
    pretrained2d: bool = True
    with_cp: bool = False
    zero_init_residual: bool = True
    dtype: Dtype = jnp.float32

    arch_settings = {
        50: (X3DBottleneck, (3, 4, 6, 3)),
        101: (X3DBottleneck, (3, 4, 23, 3)),
    }

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        use_ra = (not train) or self.norm_eval
        rw, ru, rb = self.ratio_width, self.ratio_up, self.ratio_bottleneck
        stem_ch = int(24 * rw)

        pad = tuple((k - 1) // 2 for k in self.conv1_kernel)
        x = conv3d(stem_ch, tuple(self.conv1_kernel),
                   (self.conv1_stride_t, 2, 2), pad, name='conv1',
                   dtype=self.dtype)(x)
        x = nn.relu(x)  # reference applies no norm on conv1 (:646-650)
        # depthwise temporal stem conv (conv1_3x1, :510-523)
        x = nn.Conv(stem_ch, (3, 1, 1), strides=(1, 1, 1),
                    padding=((1, 1), (0, 0), (0, 0)),
                    feature_group_count=stem_ch, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name='conv1_3x1')(x)
        x = make_norm(self.norm_cfg, name='conv1_3x1_bn', dtype=self.dtype)(
            x, use_running_average=use_ra)
        x = nn.relu(x)

        inflate_freqs = (self.inflate_freq if not isinstance(
            self.inflate_freq, int) else (self.inflate_freq,) * 4)
        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            inplanes = int(24 * rw * ru ** (i - 1)) if i > 0 else stem_ch
            planes = int(24 * rw * rb * 2 ** i)
            out_ch = int(planes / rb)
            stage_inflate = inflate_freqs[i]
            if isinstance(stage_inflate, int):
                stage_inflate = (stage_inflate,) * num_blocks
            for j in range(num_blocks):
                ss = self.spatial_strides[i] if j == 0 else 1
                ts = self.temporal_strides[i] if j == 0 else 1
                with_ds = (j == 0 and (ss != 1 or ts != 1
                                       or inplanes != out_ch))
                x = X3DBottleneck(
                    inplanes=inplanes, planes=planes, out_channels=out_ch,
                    spatial_stride=ss, temporal_stride=ts,
                    dilation=self.dilations[i], with_downsample=with_ds,
                    style=self.style, if_inflate=stage_inflate[j] == 1,
                    inflate_style=self.inflate_style,
                    norm_cfg=self.norm_cfg, dtype=self.dtype,
                    name=f'layer{i + 1}_{j}',
                )(x, train=train, norm_eval=self.norm_eval)
                inplanes = out_ch
            if i in self.out_indices and i != self.num_stages - 1:
                outs.append(x)
            if not self.no_pool2 and i == 0:
                x = max_pool3d(x, (2, 1, 1), (2, 1, 1), (0, 0, 0))

        feat_dim = int(24 * rw * 2 ** (len(stage_blocks) - 1))
        x = conv3d(int(feat_dim * rb), (1, 1, 1), name='conv5',
                   dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)   # pool5
        x = conv3d(2048, (1, 1, 1), name='fc1', dtype=self.dtype)(x)
        if outs:
            return tuple(outs) + (x,)
        return x
