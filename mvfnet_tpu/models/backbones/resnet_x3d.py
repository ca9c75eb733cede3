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

import jax

from ...ops.mvf import hard_swish
from ...ops.s2d import (depth_to_space, enter_kernel_2x2, kron4_1x1,
                        space_to_depth)
from ..builder import BACKBONES
from ..common import (BN_EPS, BNStatsParam, ConvKernelParam, SEModule,
                      make_norm)
from .resnet_i3d import conv3d, max_pool3d

Dtype = Any

_DN3D = ('NTHWC', 'THWIO', 'NTHWC')


def _bn_affine(v, scale, bias, mean, var, tile: int = 1):
    """Eval-time BatchNorm as one affine; per-channel vectors tiled for
    phase-major s2d layouts."""
    inv = scale * jax.lax.rsqrt(var + BN_EPS)
    a, c = inv, bias - mean * inv
    if tile > 1:
        a, c = jnp.tile(a, tile), jnp.tile(c, tile)
    return v * a.astype(v.dtype) + c.astype(v.dtype)


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
    # Input/output in phase-major space-to-depth layout (4x channels at
    # half spatial resolution); set by the backbone for thin stages at
    # inference. Exact same math and parameters — see ops/s2d.py.
    s2d: bool = False
    # eval-only int8 conv path; mobile blocks have no spatial-type convs
    # (conv2 is depthwise), so X3D's opportunity is quant_ops=
    # ('pointwise',) on conv1/conv3/downsample (DESIGN.md round-3)
    quant: object = None
    quant_ops: Sequence[str] = ('pointwise',)
    dtype: Dtype = jnp.float32

    def _q(self, kernel):
        if not self.quant:
            return None
        from ..common import quant_conv3d_type
        return (self.quant
                if quant_conv3d_type(kernel) in self.quant_ops else None)

    @nn.compact
    def __call__(self, x, train: bool = False, norm_eval: bool = False):
        use_ra = (not train) or norm_eval
        act = hard_swish if self.with_hs else nn.relu
        if self.s2d:
            assert use_ra, 's2d path is eval-only (BN must fold)'
            return self._forward_s2d(x, act)
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
                     name='conv1', dtype=self.dtype,
                     quant=self._q(k1))(x)
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
                     dtype=self.dtype, quant=self._q((1, 1, 1)))(out)
        out = make_norm(self.norm_cfg, name='bn3', dtype=self.dtype)(
            out, use_running_average=use_ra)
        if self.with_downsample:
            identity = conv3d(self.out_channels, (1, 1, 1), (ts, ss, ss),
                              name='downsample_conv', dtype=self.dtype,
                              quant=self._q((1, 1, 1)))(x)
            identity = make_norm(self.norm_cfg, name='downsample_bn',
                                 dtype=self.dtype)(
                identity, use_running_average=use_ra)
        return nn.relu(out + identity)

    def _forward_s2d(self, x, act):
        """Block body in phase-major s2d layout (inference).

        Same parameters and math as the standard path; only the layout
        differs: the 1x1x1 convs run as dense matmuls over 4C lanes (the
        thin-channel MXU-underfill fix — 9x measured on stage-1 conv1),
        the depthwise 3x3x3 middle runs dense (one relayout, cheaper than
        phase shuffling — measured), and conv3 re-enters s2d via a
        2x2/s2 scatter kernel at zero relayout cost. The backbone only
        selects this path for pytorch-style mobile-inflated blocks with
        temporal stride 1 and even spatial dims.
        """
        ss = self.spatial_stride
        cin, p_, cout = self.inplanes, self.planes, self.out_channels
        dt = self.dtype or jnp.float32
        k1 = ConvKernelParam((1, 1, 1, cin, p_), name='conv1')()
        bn1 = BNStatsParam(p_, name='bn1')()
        kdw = ConvKernelParam((3, 3, 3, 1, p_), name='conv2')()
        bn2 = BNStatsParam(p_, name='bn2')()
        k3 = ConvKernelParam((1, 1, 1, p_, cout), name='conv3')()
        bn3 = BNStatsParam(cout, name='bn3')()

        out = jax.lax.conv_general_dilated(
            x.astype(dt), kron4_1x1(k1).astype(dt), (1, 1, 1), 'VALID',
            dimension_numbers=_DN3D)
        out = act(_bn_affine(out, *bn1, tile=4))
        out = depth_to_space(out)
        out = jax.lax.conv_general_dilated(
            out, kdw.astype(dt), (1, ss, ss),
            ((1, 1), (1, 1), (1, 1)), dimension_numbers=_DN3D,
            feature_group_count=p_)
        out = _bn_affine(out, *bn2)
        if self.with_se:
            out = SEModule(p_, 16, self.with_hs, name='se',
                           dtype=self.dtype)(out)
        out = act(out)
        out = jax.lax.conv_general_dilated(
            out, enter_kernel_2x2(k3).astype(dt), (1, 2, 2), 'VALID',
            dimension_numbers=_DN3D)
        out = _bn_affine(out, *bn3, tile=4)

        if self.with_downsample:
            kd = ConvKernelParam((1, 1, 1, cin, cout),
                                 name='downsample_conv')()
            bnd = BNStatsParam(cout, name='downsample_bn')()
            if ss == 1:
                identity = jax.lax.conv_general_dilated(
                    x.astype(dt), kron4_1x1(kd).astype(dt), (1, 1, 1),
                    'VALID', dimension_numbers=_DN3D)
            else:
                # stride-2 1x1 == pointwise conv on the phase-0 block,
                # re-entering s2d at the new resolution
                identity = jax.lax.conv_general_dilated(
                    x[..., :cin].astype(dt), enter_kernel_2x2(kd).astype(dt),
                    (1, 2, 2), 'VALID', dimension_numbers=_DN3D)
            identity = _bn_affine(identity, *bnd, tile=4)
        else:
            identity = x
        return nn.relu(out + identity)


@BACKBONES.register_module
class ResNet_X3D(nn.Module):
    # depth accepts the reference's depth FACTORS (1 / 2.2 / 5,
    # ``resnet_x3d.py:420-426`` — 2.2 is the X3D-M-like default) as well
    # as the ResNet-style 50/101 entries this repo originally shipped.
    depth: Union[int, float]
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
    # Stages to run in space-to-depth layout at inference (ops/s2d.py).
    # MEASURED NEGATIVE RESULT, default off: isolated thin-channel ops
    # looked ~5-9x faster in s2d form (stage-1 conv1: 0.69 -> 0.076 ms),
    # but in the full graph XLA's layout assignment already handles the
    # thin stages better than their isolated-op times suggest, and the
    # re-layout *loses* end-to-end (271 clips/s -> 190 with stage 1,
    # 170 with stages 1-2, v5e bf16 16x5 dense test). Kept as an exact,
    # parameter-compatible, tested option; see docs/DESIGN.md.
    s2d_stages: Sequence[int] = ()
    # quant='int8'|'int8_static': EVAL-ONLY int8 path for the pointwise
    # block convs (quant_ops default; mobile blocks have no spatial-type
    # convs), masked per-stage like the 2-D backbone. Same param tree.
    # Mutually exclusive with s2d_stages per stage (s2d wins).
    quant: Optional[str] = None
    quant_stages: Sequence[int] = (1, 1, 1, 1)
    quant_ops: Sequence[str] = ('pointwise',)
    dtype: Dtype = jnp.float32

    arch_settings = {
        # reference depth factors (resnet_x3d.py:420-426)
        1: (X3DBottleneck, (1, 2, 5, 3)),
        2.2: (X3DBottleneck, (3, 5, 11, 7)),
        5: (X3DBottleneck, (5, 10, 25, 15)),
        # ResNet-style block counts kept for existing configs/goldens
        50: (X3DBottleneck, (3, 4, 6, 3)),
        101: (X3DBottleneck, (3, 4, 23, 3)),
    }

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        use_ra = (not train) or self.norm_eval
        if self.quant and train:
            raise ValueError('quant={!r} is an eval-only path; gradients '
                             'through int8 rounding are meaningless'
                             .format(self.quant))
        if self.quant and len(self.quant_stages) < self.num_stages:
            raise ValueError(
                f'quant_stages needs one entry per stage: got '
                f'{len(self.quant_stages)} for num_stages={self.num_stages}')
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
        in_s2d = False
        for i, num_blocks in enumerate(stage_blocks):
            inplanes = int(24 * rw * ru ** (i - 1)) if i > 0 else stem_ch
            planes = int(24 * rw * rb * 2 ** i)
            out_ch = int(planes / rb)
            stage_inflate = inflate_freqs[i]
            if isinstance(stage_inflate, int):
                stage_inflate = (stage_inflate,) * num_blocks
            dense_h = x.shape[2] * (2 if in_s2d else 1)
            dense_w = x.shape[3] * (2 if in_s2d else 1)
            stage_s2d = (
                i in self.s2d_stages and use_ra
                and (self.norm_cfg or {}).get('type', 'BN') in (
                    'BN', 'BN3d', 'SyncBN')
                and self.style == 'pytorch'
                and self.inflate_style == 'mobile'
                and all(f == 1 for f in stage_inflate)
                and self.dilations[i] == 1
                and self.temporal_strides[i] == 1
                and self.spatial_strides[i] in (1, 2)
                and dense_h % (2 * self.spatial_strides[i]) == 0
                and dense_w % (2 * self.spatial_strides[i]) == 0)
            if stage_s2d and not in_s2d:
                x = space_to_depth(x)
                in_s2d = True
            elif not stage_s2d and in_s2d:
                x = depth_to_space(x)
                in_s2d = False
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
                    norm_cfg=self.norm_cfg, s2d=stage_s2d,
                    quant=(self.quant if self.quant and not stage_s2d
                           and self.quant_stages[i] else None),
                    quant_ops=tuple(self.quant_ops), dtype=self.dtype,
                    name=f'layer{i + 1}_{j}',
                )(x, train=train, norm_eval=self.norm_eval)
                inplanes = out_ch
            if i in self.out_indices and i != self.num_stages - 1:
                outs.append(depth_to_space(x) if in_s2d else x)
            if not self.no_pool2 and i == 0:
                # temporal-only pool: phase blocks are independent lanes,
                # so it applies identically in s2d layout
                x = max_pool3d(x, (2, 1, 1), (2, 1, 1), (0, 0, 0))
        if in_s2d:
            x = depth_to_space(x)

        feat_dim = int(24 * rw * 2 ** (len(stage_blocks) - 1))
        x = conv3d(int(feat_dim * rb), (1, 1, 1), name='conv5',
                   dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)   # pool5
        x = conv3d(2048, (1, 1, 1), name='fc1', dtype=self.dtype)(x)
        if outs:
            return tuple(outs) + (x,)
        return x
