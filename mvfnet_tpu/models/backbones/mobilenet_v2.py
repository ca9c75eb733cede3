"""MobileNetV2 backbone, channels-last Flax.

Reference: ``/root/reference/codes/models/backbones/mobilenet_v2.py`` (from
d-li14/mobilenetv2.pytorch). Temporal modules (MVF / TSM) are inserted into
every InvertedResidual that has an expansion stage *and* an identity
shortcut, wrapping its first pointwise conv — the reference's surgery
condition ``len(m.conv) == 8 and m.identity``
(``recognizer2d.py:71-100``) — expressed declaratively via ``temporal_cfg``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..common import conv2d, make_norm
from ..modules.mvf import MVF
from ..modules.tsm import TemporalShift

Dtype = Any


def _make_divisible(v, divisor, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


class InvertedResidual(nn.Module):
    inp: int
    oup: int
    stride: int
    expand_ratio: int
    norm_cfg: Optional[Dict] = None
    temporal_cfg: Optional[Dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, norm_eval: bool = False):
        use_ra = (not train) or norm_eval
        hidden = round(self.inp * self.expand_ratio)
        identity = self.stride == 1 and self.inp == self.oup
        out = x
        if self.expand_ratio != 1:
            if self.temporal_cfg and identity:
                cfg = dict(self.temporal_cfg)
                kind = cfg.pop('type')
                if kind == 'MVF':
                    cfg.pop('n_div', None)
                    out = MVF(in_channels=self.inp, dtype=self.dtype,
                              **cfg)(out, train=train,
                                     norm_eval=norm_eval)
                elif kind == 'tsm':
                    out = TemporalShift(
                        n_segment=cfg['n_segment'],
                        n_div=cfg.get('n_div', 8))(out)
                else:
                    raise KeyError(kind)
            out = conv2d(hidden, 1, name='pw_conv', dtype=self.dtype)(out)
            out = make_norm(self.norm_cfg, name='pw_bn', dtype=self.dtype)(
                out, use_running_average=use_ra)
            out = relu6(out)
        out = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), feature_group_count=hidden,
                      use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name='dw_conv')(out)
        out = make_norm(self.norm_cfg, name='dw_bn', dtype=self.dtype)(
            out, use_running_average=use_ra)
        out = relu6(out)
        out = conv2d(self.oup, 1, name='pw_linear_conv',
                     dtype=self.dtype)(out)
        out = make_norm(self.norm_cfg, name='pw_linear_bn',
                        dtype=self.dtype)(out, use_running_average=use_ra)
        if identity:
            return x + out
        return out


@BACKBONES.register_module
class MobileNetV2(nn.Module):
    pretrained: Optional[str] = None
    n_class: int = 1000
    input_size: int = 224
    width_mult: float = 1.0
    norm_cfg: Optional[Dict] = None
    norm_eval: bool = False
    temporal_cfg: Optional[Dict] = None
    dtype: Dtype = jnp.float32

    cfgs = (
        # t, c, n, s
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm = self.width_mult
        div = 4 if wm == 0.1 else 8
        use_ra = (not train) or self.norm_eval
        ch = _make_divisible(32 * wm, div)
        x = conv2d(ch, 3, stride=2, padding=1, name='stem_conv',
                   dtype=self.dtype)(x)
        x = make_norm(self.norm_cfg, name='stem_bn', dtype=self.dtype)(
            x, use_running_average=use_ra)
        x = relu6(x)
        input_channel = ch
        bi = 0
        for t, c, n, s in self.cfgs:
            out_ch = _make_divisible(c * wm, div)
            for i in range(n):
                x = InvertedResidual(
                    inp=input_channel, oup=out_ch,
                    stride=s if i == 0 else 1, expand_ratio=t,
                    norm_cfg=self.norm_cfg, temporal_cfg=self.temporal_cfg,
                    dtype=self.dtype, name=f'block{bi}',
                )(x, train=train, norm_eval=self.norm_eval)
                input_channel = out_ch
                bi += 1
        out_ch = _make_divisible(1280 * wm, div) if wm > 1.0 else 1280
        x = conv2d(out_ch, 1, name='head_conv', dtype=self.dtype)(x)
        x = make_norm(self.norm_cfg, name='head_bn', dtype=self.dtype)(
            x, use_running_average=use_ra)
        return relu6(x)
