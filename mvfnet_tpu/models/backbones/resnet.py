"""2-D ResNet backbone, channels-last Flax.

TPU-native re-design of the reference ResNet
(``/root/reference/codes/models/backbones/resnet.py:329-527``). Functional
differences from a straight port:

- activations are NHWC (C minor feeds the MXU/VPU natively; no transposes)
- temporal modules (MVF / CoST / non-local) are **declared** per stage via
  ``temporal_cfg`` + ``temporal_freq`` instead of runtime module surgery
  (reference ``recognizer2d.py:45-101`` + ``MVF.py:18-49``); each selected
  block runs the module on its input before conv1, exactly where the
  reference's wrapped ``b.conv1`` placed it
- BN train/eval policy (``norm_eval``, ``frozen_stages``, ``partial_norm``,
  ``resnet.py:496-527``) is expressed through ``use_running_average`` flags
  here and optimizer masks in the engine (parameter freezing is a gradient
  concern in JAX, not a module-state concern)

Supported arch options mirror the reference: depths 18/34/50/101/152,
pytorch/caffe styles, per-stage strides/dilations, ``avg_down`` / ``avd`` /
``avd_first`` (ResNeSt tricks), ``deep_stem``, ``out_indices``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..builder import BACKBONES
from ..common import (BNStatsParam, avg_pool_torch, bn_affine, conv2d,
                      make_norm, max_pool_same_as_torch)
from ..modules.mvf import MVF

Dtype = Any


class BasicBlock(nn.Module):
    """ResNet BasicBlock (reference ``resnet.py:24-101``)."""
    inplanes: int
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    style: str = 'pytorch'
    norm_cfg: Optional[Dict] = None
    avg_down: bool = False
    temporal_cfg: Optional[Dict] = None
    dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    expansion = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 norm_eval: bool = False) -> jnp.ndarray:
        use_ra = (not train) or norm_eval
        identity = x
        out = x
        if self.temporal_cfg:
            out = _build_temporal(self.temporal_cfg, self.inplanes,
                                  self.dtype)(out, train=train, norm_eval=norm_eval)
        out = conv2d(self.planes, 3, stride=self.stride, padding=self.dilation,
                     dilation=self.dilation, name='conv1',
                     dtype=self.dtype, quant=self.quant)(out)
        out = make_norm(self.norm_cfg, name='bn1', dtype=self.dtype)(
            out, use_running_average=use_ra)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, padding=1, name='conv2',
                     dtype=self.dtype, quant=self.quant)(out)
        out = make_norm(self.norm_cfg, name='bn2', dtype=self.dtype)(
            out, use_running_average=use_ra)
        if self.with_downsample:
            identity = _downsample(x, self.planes * self.expansion,
                                   self.stride, self.dilation, self.avg_down,
                                   self.norm_cfg, use_ra, self.dtype,
                                   quant=self.quant)
        out = out + identity
        return nn.relu(out)


class Bottleneck(nn.Module):
    """ResNet Bottleneck (reference ``resnet.py:104-244``).

    When ``temporal_cfg`` is set, the temporal module (e.g. MVF) runs on the
    block input before conv1 — the exact insertion point of the reference's
    ``blocks[i].conv1 = MVF(b.conv1, ...)`` wrapping (``MVF.py:38,138``).
    """
    inplanes: int
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    style: str = 'pytorch'
    norm_cfg: Optional[Dict] = None
    avg_down: bool = False
    avd: bool = False
    avd_first: bool = False
    temporal_cfg: Optional[Dict] = None
    dtype: Dtype = jnp.float32
    quant: Optional[str] = None
    quant_carry: bool = False

    expansion = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 norm_eval: bool = False) -> jnp.ndarray:
        use_ra = (not train) or norm_eval
        avd = self.avd and self.stride > 1
        stride = 1 if avd else self.stride
        if self.style == 'pytorch':
            conv1_stride, conv2_stride = 1, stride
        else:  # caffe
            conv1_stride, conv2_stride = stride, 1

        cost_cfg = (self.temporal_cfg
                    if self.temporal_cfg
                    and self.temporal_cfg.get('type') == 'CoST' else None)
        is_mvf = (self.temporal_cfg is not None
                  and self.temporal_cfg.get('type') == 'MVF')
        # Integer-carry int8 pipeline (DESIGN.md "Int8 integer carry:
        # refuted"): conv1/conv2/conv3 exchange int8 activations directly,
        # folding the BN affines + ReLUs + requantization into one
        # int32->int8 pass each. Same math and same variable tree as the
        # unfused path, which still runs during init and calibration
        # (mutable quant_stats) so act_amax records the true conv inputs.
        # Off by default — measured slightly slower e2e than the literal
        # form, which XLA fuses on its own.
        use_carry = (self.quant == 'int8_static' and self.quant_carry
                     and not self.is_mutable_collection('quant_stats')
                     and not avd and cost_cfg is None
                     and self.temporal_cfg is None)
        if use_carry:
            out = conv2d(self.planes, 1, stride=conv1_stride, name='conv1',
                         dtype=self.dtype, quant=self.quant,
                         carry_out=True)(x)
            a1, b1 = bn_affine(*BNStatsParam(self.planes, name='bn1')())
            out = conv2d(self.planes, 3, stride=conv2_stride,
                         padding=self.dilation, dilation=self.dilation,
                         name='conv2', dtype=self.dtype, quant=self.quant,
                         carry_out=True)(out, prev_affine=(a1, b1))
            a2, b2 = bn_affine(*BNStatsParam(self.planes, name='bn2')())
            out = conv2d(self.planes * self.expansion, 1, name='conv3',
                         dtype=self.dtype,
                         quant=self.quant)(out, prev_affine=(a2, b2))
            out = make_norm(self.norm_cfg, name='bn3', dtype=self.dtype)(
                out, use_running_average=use_ra)
            identity = x
            if self.with_downsample:
                identity = _downsample(x, self.planes * self.expansion,
                                       self.stride, self.dilation,
                                       self.avg_down, self.norm_cfg, use_ra,
                                       self.dtype, quant=self.quant)
            return nn.relu(out + identity)
        identity = x
        if is_mvf:
            # MVF + split conv1: the untouched (1-alpha) channels stream
            # from x directly instead of through a concat (see
            # _SplitPointwiseConv; measured ~14% of inference recovered).
            cfg = dict(self.temporal_cfg)
            cfg.pop('type')
            cs = int(self.inplanes * cfg.get('alpha', 0.5))
            if cs == 0:
                out = conv2d(self.planes, 1, stride=conv1_stride,
                             name='conv1', dtype=self.dtype,
                             quant=self.quant)(x)
            else:
                y = MVF(in_channels=self.inplanes, concat=False,
                        dtype=self.dtype, **cfg)(x, train=train,
                                                 norm_eval=norm_eval)
                out = _SplitPointwiseConv(
                    features=self.planes, split=cs,
                    in_channels=self.inplanes, stride=conv1_stride,
                    dtype=self.dtype, quant=self.quant,
                    name='conv1')(y, x[..., cs:])
        else:
            out = x
            if self.temporal_cfg and not cost_cfg:
                out = _build_temporal(self.temporal_cfg, self.inplanes,
                                      self.dtype)(out, train=train, norm_eval=norm_eval)
            out = conv2d(self.planes, 1, stride=conv1_stride, name='conv1',
                         dtype=self.dtype, quant=self.quant)(out)
        out = make_norm(self.norm_cfg, name='bn1', dtype=self.dtype)(
            out, use_running_average=use_ra)
        out = nn.relu(out)
        if avd and self.avd_first:
            out = avg_pool_torch(out, 3, self.stride, padding=1)
        if cost_cfg:
            # CoST replaces conv2 of this block (CoST.py:38-42,104)
            out = _build_temporal(cost_cfg, self.planes,
                                  self.dtype)(out, train=train, norm_eval=norm_eval)
        else:
            out = conv2d(self.planes, 3, stride=conv2_stride,
                         padding=self.dilation, dilation=self.dilation,
                         name='conv2', dtype=self.dtype,
                         quant=self.quant)(out)
        out = make_norm(self.norm_cfg, name='bn2', dtype=self.dtype)(
            out, use_running_average=use_ra)
        out = nn.relu(out)
        if avd and not self.avd_first:
            out = avg_pool_torch(out, 3, self.stride, padding=1)
        out = conv2d(self.planes * self.expansion, 1, name='conv3',
                     dtype=self.dtype, quant=self.quant)(out)
        out = make_norm(self.norm_cfg, name='bn3', dtype=self.dtype)(
            out, use_running_average=use_ra)
        if self.with_downsample:
            identity = _downsample(x, self.planes * self.expansion,
                                   self.stride, self.dilation, self.avg_down,
                                   self.norm_cfg, use_ra, self.dtype,
                                   quant=self.quant)
        out = out + identity
        return nn.relu(out)


class _SplitPointwiseConv(nn.Module):
    """1x1 conv whose input arrives in two channel groups.

    Mathematically identical to conv1 on the concatenated tensor (a 1x1
    conv is linear in channels), but the untouched group streams straight
    from the block input instead of being rewritten through an HBM concat —
    the dominant cost of the MVF insertion. Parameter layout matches
    ``nn.Conv(name='conv1')`` exactly (one (1,1,C,features) kernel), so
    checkpoints are unaffected.
    """
    features: int
    split: int      # channel count of the first (transformed) group
    in_channels: int
    stride: int = 1
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, y_first: jnp.ndarray, x_rest: jnp.ndarray):
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (1, 1, self.in_channels, self.features), jnp.float32)
        dn = ('NHWC', 'HWIO', 'NHWC')
        s = (self.stride, self.stride)

        if self.quant in ('int8', 'int8_static'):
            from ..common import _act_quant
            # shared per-output-channel weight scale; each input group gets
            # its own per-tensor activation scale (the sum stays exact in
            # the rescaled domain because a 1x1 conv is linear)
            sw = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0,
                             1e-12)
            kq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
            static = self.quant == 'int8_static'

            def qconv(v, kk, stat):
                sx, vq = _act_quant(self, stat, v.astype(jnp.float32),
                                    static)
                y = jax.lax.conv_general_dilated(
                    vq, kk, window_strides=s, padding='VALID',
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                return y.astype(jnp.float32) * (sx * sw)

            out = qconv(y_first, kq[:, :, :self.split], 'act_amax_y') \
                + qconv(x_rest, kq[:, :, self.split:], 'act_amax_x')
            return out.astype(self.dtype)

        k = kernel.astype(self.dtype) if self.dtype else kernel

        def conv(v, kk):
            return jax.lax.conv_general_dilated(
                v.astype(k.dtype), kk, window_strides=s, padding='VALID',
                dimension_numbers=dn)

        return conv(y_first, k[:, :, :self.split]) \
            + conv(x_rest, k[:, :, self.split:])


class _SpaceToDepthStem(nn.Module):
    """7x7/s2/p3 stem conv evaluated in space-to-depth form.

    With 3 input channels the MXU contracts over K=3 of 128 lanes; the
    MLPerf-ResNet trick zero-pads the kernel to 8x8, moves 2x2 pixel blocks
    into channels (K=12), and runs an equivalent 4x4/s1 conv on the
    half-resolution grid. Bit-exact to the original conv; the parameter
    remains the plain (7,7,C,64) 'conv1/kernel' so checkpoints are
    unaffected.
    """
    features: int = 64
    # eval-only int8 form of the s2d conv (K=48 contraction); gated by
    # the backbone's quant_stem knob, see DESIGN.md "Int8 dense-test"
    quant: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (7, 7, c, self.features), jnp.float32)
        k = kernel.astype(self.dtype) if self.dtype else kernel
        x = x.astype(k.dtype)
        # kernel: top/left zero-pad to 8x8, then 2x2-block -> channel
        k = jnp.pad(k, [(1, 0), (1, 0), (0, 0), (0, 0)])
        k = k.reshape(4, 2, 4, 2, c, self.features)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c,
                                                  self.features)
        # input: effective padding (4, 3) per spatial dim (3 from the conv,
        # +1 matching the kernel shift), +1 right/bottom for even blocking;
        # the surplus final output row/col is dropped below.
        xp = jnp.pad(x, [(0, 0), (4, 4), (4, 4), (0, 0)])
        hp, wp = h + 8, w + 8
        xp = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2,
                                                    4 * c)
        if self.quant in ('int8', 'int8_static'):
            from ..common import _act_quant
            kf = k.astype(jnp.float32)
            sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0,
                             1e-12)
            kq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
            sx, xq = _act_quant(self, 'act_amax', xp.astype(jnp.float32),
                                self.quant == 'int8_static')
            out = jax.lax.conv_general_dilated(
                xq, kq, window_strides=(1, 1), padding='VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.int32)
            out = (out.astype(jnp.float32) * (sx * sw)).astype(
                self.dtype or jnp.float32)
        else:
            out = jax.lax.conv_general_dilated(
                xp, k, window_strides=(1, 1), padding='VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return out[:, :h // 2, :w // 2]


def _downsample(x, out_ch, stride, dilation, avg_down, norm_cfg, use_ra,
                dtype, quant=None):
    """Shortcut projection (reference ``make_res_layer``, ``resnet.py:279-304``)."""
    if avg_down:
        if dilation == 1:
            x = avg_pool_torch(x, stride, stride, ceil_mode=True,
                               count_include_pad=False)
        out = conv2d(out_ch, 1, stride=1, name='downsample_conv',
                     dtype=dtype, quant=quant)(x)
    else:
        out = conv2d(out_ch, 1, stride=stride, name='downsample_conv',
                     dtype=dtype, quant=quant)(x)
    return make_norm(norm_cfg, name='downsample_bn', dtype=dtype)(
        out, use_running_average=use_ra)


def _build_temporal(cfg: Dict, in_channels: int, dtype) -> nn.Module:
    cfg = dict(cfg)
    kind = cfg.pop('type')
    if kind == 'MVF':
        return MVF(in_channels=in_channels, dtype=dtype, **cfg)
    if kind == 'CoST':
        from ..modules.cost import CoST
        return CoST(in_channels=in_channels, dtype=dtype, **cfg)
    raise KeyError(f'Unknown temporal module {kind}')


@BACKBONES.register_module
class ResNet(nn.Module):
    """ResNet-18/34/50/101/152, NHWC.

    ``temporal_cfg``: dict like ``dict(type='MVF', n_segment=8, alpha=0.125,
    mode='THW')`` (the reference's ``module_cfg`` minus ``mvf_freq``).
    ``temporal_freq``: per-stage 0/1 mask, the reference's ``mvf_freq``
    (``MVF.py:42-49``); every block of a selected stage gets the module
    (n_round == 1 in the reference, ``MVF.py:27-38``).
    """
    depth: int
    in_channels: int = 3
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    style: str = 'pytorch'
    frozen_stages: int = -1
    norm_cfg: Optional[Dict] = None
    norm_eval: bool = True
    norm_frozen: bool = False
    partial_norm: bool = False
    avg_down: bool = False
    avd: bool = False
    avd_first: bool = False
    deep_stem: bool = False
    stem_width: int = 64
    # evaluate the 7x7/s2 stem in space-to-depth form (bit-exact, faster on
    # TPU where K=3 starves the MXU; see _SpaceToDepthStem)
    stem_s2d: bool = True
    temporal_cfg: Optional[Dict] = None
    temporal_freq: Sequence[int] = (0, 0, 0, 0)
    # Non-local wrappers after selected blocks of stages 2/3 (reference
    # make_non_local, local_attention.py:191-222); needs clip length to
    # unfold the folded-time batch.
    nonlocal_cfg: Optional[Dict] = None
    pretrained: Optional[str] = None   # resolved by the checkpoint loader
    with_cp: bool = False              # remat; applied per res-stage
    dtype: Dtype = jnp.float32
    # quant='int8'|'int8_static': EVAL-ONLY int8 MXU path for block convs
    # (stem and temporal modules stay in compute dtype). Same parameter
    # tree — any checkpoint loads unchanged; weights are re-quantized per
    # call from the fp32 params. quant_stages selects which res-stages
    # quantize (per-stage 0/1 mask like temporal_freq). See DESIGN.md
    # "Int8 dense-test" for measurements and the numeric-error contract
    # (tests/test_quant_int8.py).
    quant: Optional[str] = None
    quant_stages: Sequence[int] = (1, 1, 1, 1)
    # integer-carry pipeline for int8_static (adjacent quantized convs
    # exchange int8 through folded BN+ReLU epilogues — same math; see
    # IntCarry in common.py). OFF by default: measured e2e-NEGATIVE on
    # TPU (-3.5% twice, same-session A/B) — XLA already fuses the literal
    # dequant->BN->relu->requant chain into one pass, and the manual fold
    # compiles to a slightly worse program. Kept as tested measurement
    # apparatus (DESIGN.md "Int8 integer carry: refuted").
    quant_carry: bool = False
    # additionally quantize the s2d stem conv (excluded by default: the
    # first conv sees raw normalized pixels and its drift propagates
    # through every stage; flip on to measure — 2.04 of 28.1 ms e2e)
    quant_stem: bool = False

    arch_settings = {
        18: (BasicBlock, (2, 2, 2, 2)),
        34: (BasicBlock, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
        152: (Bottleneck, (3, 8, 36, 3)),
    }

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.depth not in self.arch_settings:
            raise KeyError(f'invalid depth {self.depth} for resnet')
        block_cls, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        if self.quant and train:
            raise ValueError('quant={!r} is an eval-only path; gradients '
                             'through int8 rounding are meaningless'
                             .format(self.quant))
        if self.quant and len(self.quant_stages) < self.num_stages:
            raise ValueError(
                f'quant_stages needs one entry per stage: got '
                f'{len(self.quant_stages)} for num_stages={self.num_stages}')
        use_ra = (not train) or self.norm_eval

        if self.deep_stem:
            sw = self.stem_width
            for i, (ch, st) in enumerate([(sw, 2), (sw, 1), (sw * 2, 1)]):
                x = conv2d(ch, 3, stride=st, padding=1,
                           name=f'stem_conv{i + 1}', dtype=self.dtype)(x)
                if i < 2:
                    x = make_norm(self.norm_cfg, name=f'stem_bn{i + 1}',
                                  dtype=self.dtype)(
                        x, use_running_average=use_ra)
                    x = nn.relu(x)
            inplanes = sw * 2
        elif self.stem_s2d:
            x = _SpaceToDepthStem(features=64, dtype=self.dtype,
                                  quant=(self.quant if self.quant_stem
                                         else None),
                                  name='conv1')(x)
            inplanes = 64
        else:
            x = conv2d(64, 7, stride=2, padding=3, name='conv1',
                       dtype=self.dtype)(x)
            inplanes = 64
        x = make_norm(self.norm_cfg, name='bn1', dtype=self.dtype)(
            x, use_running_average=use_ra)
        x = nn.relu(x)
        x = max_pool_same_as_torch(x, 3, 2, 1)

        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            planes = 64 * 2 ** i
            # partial_norm: BN of stages 1..frozen_stages runs in eval mode
            # even while training (reference resnet.py:506-513)
            stage_norm_eval = self.norm_eval or (
                self.partial_norm and (i + 1) <= self.frozen_stages)
            stage_temporal = (self.temporal_cfg
                              if self.temporal_cfg and self.temporal_freq[i]
                              else None)
            is_cost = (stage_temporal is not None
                       and stage_temporal.get('type') == 'CoST')
            for j in range(num_blocks):
                # CoST skips the first block of a stage (CoST.py:40-41);
                # MVF is inserted in every block (MVF.py:36-39).
                block_temporal = (None if (is_cost and j == 0)
                                  else stage_temporal)
                stride = self.strides[i] if j == 0 else 1
                with_ds = (j == 0 and
                           (self.strides[i] != 1
                            or inplanes != planes * block_cls.expansion))
                kwargs = dict(
                    inplanes=inplanes,
                    planes=planes,
                    stride=stride,
                    dilation=self.dilations[i],
                    with_downsample=with_ds,
                    style=self.style,
                    norm_cfg=self.norm_cfg,
                    avg_down=self.avg_down,
                    temporal_cfg=block_temporal,
                    dtype=self.dtype,
                    quant=(self.quant if self.quant
                           and self.quant_stages[i] else None),
                    name=f'layer{i + 1}_{j}',
                )
                if block_cls is Bottleneck:
                    kwargs.update(avd=self.avd, avd_first=self.avd_first,
                                  quant_carry=self.quant_carry)
                # with_cp (activation rematerialization) is applied at the
                # train-step level via jax.checkpoint policies; block-level
                # remat is unnecessary under XLA.
                x = block_cls(**kwargs)(x, train=train,
                                        norm_eval=stage_norm_eval)
                inplanes = planes * block_cls.expansion
                if self.nonlocal_cfg and i in (1, 2):
                    from ..modules.nonlocal_attention import (
                        LocalAttention, nonlocal_block_indices)
                    num_nl = 2 if i == 1 else 3
                    if j in nonlocal_block_indices(num_blocks, num_nl):
                        n_seg = self.nonlocal_cfg['n_segment']
                        nt, hh, ww, cc = x.shape
                        x5 = x.reshape(nt // n_seg, n_seg, hh, ww, cc)
                        x5 = LocalAttention(
                            dim=cc, hidden=cc // 2, dtype=self.dtype,
                            name=f'nonlocal{i + 1}_{j}')(
                            x5, train=train, norm_eval=stage_norm_eval)
                        x = x5.reshape(nt, hh, ww, cc)
            if i in self.out_indices:
                outs.append(x)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
