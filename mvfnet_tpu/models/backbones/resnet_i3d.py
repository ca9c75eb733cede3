"""Inflated 3-D ResNet (I3D), channels-last Flax.

Reference: ``/root/reference/codes/models/backbones/resnet_i3d.py``.
Activations are (N, T, H, W, C). Covered options: inflate styles
('3x1x1' folds the temporal tap into conv1, '3x3x3' into conv2), per-stage
spatial/temporal strides, per-block inflate_freq, conv1_kernel/stride,
pool1/pool2 (temporal maxpool after stage 1), avg_down / avd / deep_stem,
pytorch/caffe styles, per-block non-local insertion.

2D->3D weight inflation (reference ``init_weights``: 2-D kernel / kT
broadcast over the temporal taps) is performed by the checkpoint importer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..common import make_norm

Dtype = Any


def conv3d(features: int, kernel: Tuple[int, int, int],
           stride: Tuple[int, int, int] = (1, 1, 1),
           padding: Optional[Tuple[int, int, int]] = None,
           dilation: Tuple[int, int, int] = (1, 1, 1),
           use_bias: bool = False, name: Optional[str] = None,
           dtype: Dtype = jnp.float32,
           quant: Optional[str] = None) -> nn.Module:
    """torch-semantics Conv3d on (N,T,H,W,C).

    ``quant='int8'|'int8_static'`` swaps in
    :class:`~mvfnet_tpu.models.common.QuantConv3d` (same param tree) —
    callers gate by conv type via ``quant_conv3d_type``."""
    if padding is None:
        padding = tuple((k - 1) // 2 for k in kernel)
    pad = tuple((p, p) for p in padding)
    if quant in ('int8', 'int8_static'):
        from ..common import QuantConv3d
        return QuantConv3d(features=features, kernel_size=kernel,
                           strides=stride, padding=pad, dilation=dilation,
                           use_bias=use_bias,
                           static=(quant == 'int8_static'),
                           dtype=dtype, name=name)
    if quant is not None:
        raise ValueError(f'unknown quant mode {quant!r}')
    return nn.Conv(features=features, kernel_size=kernel, strides=stride,
                   padding=pad, kernel_dilation=dilation, use_bias=use_bias,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def max_pool3d(x, kernel, stride, padding):
    pads = tuple((p, p) for p in padding)
    return nn.max_pool(x, kernel, strides=stride, padding=pads)


def avg_pool3d(x, kernel, stride, padding=(0, 0, 0),
               count_include_pad=True, ceil_mode=False):
    if ceil_mode:
        t, h, w = x.shape[1], x.shape[2], x.shape[3]
        extra = [(-(d - k) % s) if d > k else 0
                 for d, k, s in zip((t, h, w), kernel, stride)]
    else:
        extra = [0, 0, 0]
    pads = tuple((p, p + e) for p, e in zip(padding, extra))
    summed = nn.pool(x, 0.0, jnp.add, kernel, stride, pads)
    if count_include_pad and not ceil_mode:
        denom = kernel[0] * kernel[1] * kernel[2]
        return summed / denom
    ones = jnp.ones((1,) + x.shape[1:4] + (1,), x.dtype)
    counts = nn.pool(ones, 0.0, jnp.add, kernel, stride, pads)
    return summed / counts


class _SpaceToDepthStem3D(nn.Module):
    """(kt,7,7)/s(st,2,2)/p(pt,3,3) stem conv in spatial space-to-depth form.

    3-D extension of the flagship's ``_SpaceToDepthStem``
    (``resnet.py:240``): the temporal taps are untouched; the spatial
    7x7/s2 conv is re-expressed as a 4x4/s1 conv over 2x2 pixel blocks
    folded into channels, raising the MXU contraction minor dim from
    C=3 to 4C=12. Bit-exact to the plain conv (tests/test_i3d.py), and
    the parameter stays the plain ``(kt,7,7,C,F)`` ``conv1/kernel`` so
    checkpoints are unaffected.

    Motivation (``tools/bench_stem3d.py``, v5e, batch 8 x 32f @224):
    the plain I3D stem alone is 22.0 ms fwd / 30.0 ms fwd+bwd of a
    44.1 ms full-backbone train step; this form runs 8.8 / 18.8 ms.
    """
    features: int
    kernel_t: int
    stride_t: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax
        n, t, h, w, c = x.shape
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (self.kernel_t, 7, 7, c, self.features),
                            jnp.float32)
        k = kernel.astype(self.dtype) if self.dtype else kernel
        x = x.astype(k.dtype)
        # kernel: top/left zero-pad spatial taps to 8x8, fold 2x2 -> channel
        k = jnp.pad(k, [(0, 0), (1, 0), (1, 0), (0, 0), (0, 0)])
        k = k.reshape(self.kernel_t, 4, 2, 4, 2, c, self.features)
        k = k.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
            self.kernel_t, 4, 4, 4 * c, self.features)
        # input: spatial pad (4,4) (3 from the conv +1 for the kernel
        # shift, +1 right/bottom for even blocking; surplus output
        # row/col cropped below), fold 2x2 blocks -> channels
        xp = jnp.pad(x, [(0, 0), (0, 0), (4, 4), (4, 4), (0, 0)])
        hp, wp = h + 8, w + 8
        xp = xp.reshape(n, t, hp // 2, 2, wp // 2, 2, c)
        xp = xp.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            n, t, hp // 2, wp // 2, 4 * c)
        pt = (self.kernel_t - 1) // 2
        out = jax.lax.conv_general_dilated(
            xp, k, window_strides=(self.stride_t, 1, 1),
            padding=((pt, pt), (0, 0), (0, 0)),
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return out[:, :, :h // 2, :w // 2]


def stem_conv3d(features: int, kernel: Tuple[int, int, int],
                stride: Tuple[int, int, int], padding: Tuple[int, int, int],
                name: str, dtype, s2d, in_shape,
                train: bool = False) -> nn.Module:
    """Stem conv dispatcher: s2d form when requested AND applicable
    (7x7 spatial taps, stride 2, symmetric pad 3, even H/W).

    ``s2d`` is False / True / ``'train'``. ``'train'`` selects the s2d
    form only inside the training step: the two forms are bit-exact on
    the same parameter, and the e2e measurements went opposite ways by
    phase (SlowFast train −28 ms/step, eval −3%; DESIGN.md "3-D stem
    space-to-depth"), so each jitted program gets its best form."""
    kt, kh, kw = kernel
    st, sh, sw_ = stride
    want = s2d is True or (s2d == 'train' and train)
    applicable = (want and (kh, kw) == (7, 7) and (sh, sw_) == (2, 2)
                  and padding[1:] == (3, 3)
                  and in_shape[2] % 2 == 0 and in_shape[3] % 2 == 0)
    if applicable:
        return _SpaceToDepthStem3D(features=features, kernel_t=kt,
                                   stride_t=st, dtype=dtype, name=name)
    return conv3d(features, kernel, stride, padding, name=name, dtype=dtype)


class Bottleneck3D(nn.Module):
    """Reference ``resnet_i3d.py:130-325``."""
    inplanes: int
    planes: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    style: str = 'pytorch'
    if_inflate: bool = True
    inflate_style: str = '3x1x1'
    norm_cfg: Optional[Dict] = None
    nonlocal_cfg: Optional[Dict] = None
    avg_down: bool = False
    avd: bool = False
    avd_first: bool = False
    # eval-only int8 conv path, gated per conv TYPE (DESIGN.md round-3
    # conv3d microbench: spatial +41%, temporal loses)
    quant: Optional[str] = None
    quant_ops: Sequence[str] = ('spatial',)
    dtype: Dtype = jnp.float32

    expansion = 4

    def _q(self, kernel):
        if not self.quant:
            return None
        from ..common import quant_conv3d_type
        return (self.quant
                if quant_conv3d_type(kernel) in self.quant_ops else None)

    @nn.compact
    def __call__(self, x, train: bool = False, norm_eval: bool = False):
        use_ra = (not train) or norm_eval
        avd = self.avd and self.spatial_stride > 1
        ss = 1 if avd else self.spatial_stride
        ts = self.temporal_stride
        if self.style == 'pytorch':
            c1_s, c2_s, c1_t, c2_t = 1, ss, 1, ts
        else:
            c1_s, c2_s, c1_t, c2_t = ss, 1, ts, 1

        if self.if_inflate:
            if self.inflate_style == '3x1x1':
                k1, p1 = (3, 1, 1), (1, 0, 0)
                k2, p2 = (1, 3, 3), (0, self.dilation, self.dilation)
            else:  # '3x3x3'
                k1, p1 = (1, 1, 1), (0, 0, 0)
                k2, p2 = (3, 3, 3), (1, self.dilation, self.dilation)
        else:
            k1, p1 = (1, 1, 1), (0, 0, 0)
            k2, p2 = (1, 3, 3), (0, self.dilation, self.dilation)
            c1_t, c2_t = 1, 1

        identity = x
        out = conv3d(self.planes, k1, (c1_t, c1_s, c1_s), p1,
                     name='conv1', dtype=self.dtype,
                     quant=self._q(k1))(x)
        out = make_norm(self.norm_cfg, name='bn1', dtype=self.dtype)(
            out, use_running_average=use_ra)
        out = nn.relu(out)
        if avd and self.avd_first:
            out = avg_pool3d(out, (1, 3, 3),
                             (1, self.spatial_stride, self.spatial_stride),
                             (0, 1, 1))
        out = conv3d(self.planes, k2, (c2_t, c2_s, c2_s), p2,
                     dilation=(1, self.dilation, self.dilation),
                     name='conv2', dtype=self.dtype,
                     quant=self._q(k2))(out)
        out = make_norm(self.norm_cfg, name='bn2', dtype=self.dtype)(
            out, use_running_average=use_ra)
        out = nn.relu(out)
        if avd and not self.avd_first:
            out = avg_pool3d(out, (1, 3, 3),
                             (1, self.spatial_stride, self.spatial_stride),
                             (0, 1, 1))
        out = conv3d(self.planes * self.expansion, (1, 1, 1),
                     name='conv3', dtype=self.dtype,
                     quant=self._q((1, 1, 1)))(out)
        out = make_norm(self.norm_cfg, name='bn3', dtype=self.dtype)(
            out, use_running_average=use_ra)

        if self.with_downsample:
            identity = self._downsample(x, use_ra)
        out = nn.relu(out + identity)

        if self.nonlocal_cfg is not None:
            from ..modules.nonlocal_attention import build_nonlocal_block
            out = build_nonlocal_block(
                dict(self.nonlocal_cfg,
                     in_channels=self.planes * self.expansion),
                dtype=self.dtype)(out, train=train, norm_eval=norm_eval)
        return out

    def _downsample(self, x, use_ra):
        ss, ts = self.spatial_stride, self.temporal_stride
        if self.avg_down:
            if self.dilation == 1:
                x = avg_pool3d(x, (1, ss, ss), (1, ss, ss),
                               count_include_pad=False, ceil_mode=True)
            out = conv3d(self.planes * self.expansion, (1, 1, 1),
                         (ts, 1, 1), name='downsample_conv',
                         dtype=self.dtype)(x)
        else:
            out = conv3d(self.planes * self.expansion, (1, 1, 1),
                         (ts, ss, ss), name='downsample_conv',
                         dtype=self.dtype)(x)
        return make_norm(self.norm_cfg, name='downsample_bn',
                         dtype=self.dtype)(out, use_running_average=use_ra)


class BasicBlock3D(nn.Module):
    """Reference ``resnet_i3d.py:47-127``."""
    inplanes: int
    planes: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    style: str = 'pytorch'
    if_inflate: bool = True
    inflate_style: str = '3x1x1'  # unused for basic blocks
    norm_cfg: Optional[Dict] = None
    nonlocal_cfg: Optional[Dict] = None
    avg_down: bool = False
    avd: bool = False
    avd_first: bool = False
    quant: Optional[str] = None
    quant_ops: Sequence[str] = ('spatial',)
    dtype: Dtype = jnp.float32

    expansion = 1

    _q = Bottleneck3D._q

    @nn.compact
    def __call__(self, x, train: bool = False, norm_eval: bool = False):
        use_ra = (not train) or norm_eval
        ss, ts = self.spatial_stride, self.temporal_stride
        k = (3, 3, 3) if self.if_inflate else (1, 3, 3)
        p = (1, self.dilation, self.dilation) if self.if_inflate \
            else (0, self.dilation, self.dilation)
        identity = x
        out = conv3d(self.planes, k, (ts, ss, ss), p, name='conv1',
                     dtype=self.dtype, quant=self._q(k))(x)
        out = make_norm(self.norm_cfg, name='bn1', dtype=self.dtype)(
            out, use_running_average=use_ra)
        out = nn.relu(out)
        out = conv3d(self.planes, k, (1, 1, 1), p, name='conv2',
                     dtype=self.dtype, quant=self._q(k))(out)
        out = make_norm(self.norm_cfg, name='bn2', dtype=self.dtype)(
            out, use_running_average=use_ra)
        if self.with_downsample:
            out_ch = self.planes * self.expansion
            identity = conv3d(out_ch, (1, 1, 1), (ts, ss, ss),
                              name='downsample_conv', dtype=self.dtype)(x)
            identity = make_norm(self.norm_cfg, name='downsample_bn',
                                 dtype=self.dtype)(
                identity, use_running_average=use_ra)
        return nn.relu(out + identity)


@BACKBONES.register_module
class ResNet_I3D(nn.Module):
    depth: int
    in_channels: int = 3
    num_stages: int = 4
    spatial_strides: Sequence[int] = (1, 2, 2, 2)
    temporal_strides: Sequence[int] = (1, 1, 1, 1)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    conv1_kernel: Tuple[int, int, int] = (5, 7, 7)
    conv1_stride_t: int = 2
    pool1_kernel_t: int = 1
    pool1_stride_t: int = 2
    pool1_stride_s: int = 2
    style: str = 'pytorch'
    frozen_stages: int = -1
    inflate_freq: Union[int, Sequence] = (1, 1, 1, 1)
    inflate_style: str = '3x1x1'
    norm_cfg: Optional[Dict] = None
    nonlocal_stages: Sequence[int] = (-1,)
    nonlocal_freq: Union[int, Sequence] = (0, 1, 1, 0)
    nonlocal_cfg: Optional[Dict] = None
    no_pool2: bool = False
    norm_eval: bool = True
    norm_frozen: bool = False
    partial_norm: bool = False
    avg_down: bool = False
    avd: bool = False
    avd_first: bool = False
    deep_stem: bool = False
    stem_width: int = 64
    pretrained: Optional[str] = None
    pretrained2d: bool = True
    with_cp: bool = False
    zero_init_residual: bool = True
    # quant='int8'|'int8_static': EVAL-ONLY int8 path for block convs,
    # masked per-stage (quant_stages) AND per conv TYPE (quant_ops —
    # default spatial-only, from the conv3d microbench: spatial 1x3x3
    # +41% int8, temporal 3x1x1 loses; DESIGN.md "Round-3 candidates").
    # Same param tree — any checkpoint loads unchanged.
    quant: Optional[str] = None
    quant_stages: Sequence[int] = (1, 1, 1, 1)
    quant_ops: Sequence[str] = ('spatial',)
    # bit-exact space-to-depth stem (see _SpaceToDepthStem3D), same
    # param tree: False / True / 'train'. Default OFF for I3D — the
    # isolated probe won 2.5x but e2e LOST (train 182.9 -> 178.4,
    # eval 520 -> 432 clips/s; DESIGN.md "3-D stem space-to-depth"):
    # in-context XLA already lays out the plain stem better than the
    # isolated compile suggested. Kept as a tested option + recorded
    # refutation (the X3D-s2d pattern).
    stem_s2d: Union[bool, str] = False
    dtype: Dtype = jnp.float32

    arch_settings = {
        18: (BasicBlock3D, (2, 2, 2, 2)),
        34: (BasicBlock3D, (3, 4, 6, 3)),
        50: (Bottleneck3D, (3, 4, 6, 3)),
        101: (Bottleneck3D, (3, 4, 23, 3)),
        152: (Bottleneck3D, (3, 8, 36, 3)),
    }

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, T, H, W, C)."""
        block_cls, stage_blocks = self.arch_settings[self.depth]
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

        if self.deep_stem:
            sw = self.stem_width
            for i, (ch, st) in enumerate([(sw, 2), (sw, 1), (sw * 2, 1)]):
                x = conv3d(ch, (1, 3, 3), (1, st, st), (0, 1, 1),
                           name=f'stem_conv{i + 1}', dtype=self.dtype)(x)
                if i < 2:
                    x = make_norm(self.norm_cfg, name=f'stem_bn{i + 1}',
                                  dtype=self.dtype)(
                        x, use_running_average=use_ra)
                    x = nn.relu(x)
            inplanes = sw * 2
        else:
            pad = tuple((k - 1) // 2 for k in self.conv1_kernel)
            x = stem_conv3d(64, tuple(self.conv1_kernel),
                            (self.conv1_stride_t, 2, 2), pad, name='conv1',
                            dtype=self.dtype, s2d=self.stem_s2d,
                            in_shape=x.shape, train=train)(x)
            inplanes = 64
        x = make_norm(self.norm_cfg, name='bn1', dtype=self.dtype)(
            x, use_running_average=use_ra)
        x = nn.relu(x)
        x = max_pool3d(x, (self.pool1_kernel_t, 3, 3),
                       (self.pool1_stride_t, self.pool1_stride_s,
                        self.pool1_stride_s),
                       (self.pool1_kernel_t // 2, 1, 1))

        inflate_freqs = (self.inflate_freq if not isinstance(
            self.inflate_freq, int) else (self.inflate_freq,) * 4)
        nonlocal_freqs = (self.nonlocal_freq if not isinstance(
            self.nonlocal_freq, int) else (self.nonlocal_freq,) * 4)

        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            planes = 64 * 2 ** i
            stage_inflate = inflate_freqs[i]
            if isinstance(stage_inflate, int):
                stage_inflate = (stage_inflate,) * num_blocks
            stage_nl = nonlocal_freqs[i]
            if isinstance(stage_nl, int):
                stage_nl = (stage_nl,) * num_blocks
            nl_cfg = (self.nonlocal_cfg if i in self.nonlocal_stages
                      else None)
            for j in range(num_blocks):
                ss = self.spatial_strides[i] if j == 0 else 1
                ts = self.temporal_strides[i] if j == 0 else 1
                with_ds = (j == 0 and
                           (ss != 1
                            or inplanes != planes * block_cls.expansion))
                x = block_cls(
                    inplanes=inplanes, planes=planes, spatial_stride=ss,
                    temporal_stride=ts, dilation=self.dilations[i],
                    with_downsample=with_ds, style=self.style,
                    if_inflate=stage_inflate[j] == 1,
                    inflate_style=self.inflate_style,
                    norm_cfg=self.norm_cfg,
                    nonlocal_cfg=nl_cfg if stage_nl[j] == 1 else None,
                    avg_down=self.avg_down, avd=self.avd,
                    avd_first=self.avd_first,
                    quant=(self.quant
                           if self.quant and self.quant_stages[i]
                           else None),
                    quant_ops=tuple(self.quant_ops), dtype=self.dtype,
                    name=f'layer{i + 1}_{j}',
                )(x, train=train, norm_eval=self.norm_eval)
                inplanes = planes * block_cls.expansion
            if i in self.out_indices:
                outs.append(x)
            if not self.no_pool2 and i == 0:
                x = max_pool3d(x, (2, 1, 1), (2, 1, 1), (0, 0, 0))
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
