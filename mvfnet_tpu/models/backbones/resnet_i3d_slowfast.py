"""SlowFast two-pathway I3D ResNet, channels-last Flax.

Reference: ``/root/reference/codes/models/backbones/resnet_i3d_slowfast.py``.
Input: (N, T, H, W, C) full-rate frames. The slow path samples every
``tau``-th frame, the fast path every ``tau/alpha``-th; fast features feed
the slow path through (5,1,1)-stride-(alpha,1,1) lateral convs concatenated
before each stage (reference ``forward``, :474-519). Fast channels are
``1/beta_inv`` of slow. ``slow_only`` / ``fast_only`` single-pathway modes
supported. All temporal strides are 1 (":209 all temporal strides are set to
1 in SlowFast").

Returns (slow, fast) feature tuples per out_index (or a single tensor in
single-pathway modes), consumed by I3DSlowFastClsHead.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from ...ops.tpack import pack_t, unpack_t
from ..builder import BACKBONES
from ..common import make_norm
from .packed3d import PackedBottleneck3D
from .resnet_i3d import (BasicBlock3D, Bottleneck3D, conv3d, max_pool3d,
                         stem_conv3d)

Dtype = Any


@BACKBONES.register_module
class ResNet_I3D_SlowFast(nn.Module):
    depth: int
    tau: int = 16
    alpha: int = 8
    beta_inv: int = 8
    num_stages: int = 4
    slow_only: bool = False
    fast_only: bool = False
    lateral_type: str = 'conv'
    lateral_op: str = 'concat'
    spatial_strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    slow_conv1_kernel_t: int = 1
    slow_conv1_stride_t: int = 1
    slow_pool1_kernel_t: int = 1
    slow_pool1_stride_t: int = 1
    fast_conv1_kernel_t: int = 5
    fast_conv1_stride_t: int = 1
    fast_pool1_kernel_t: int = 1
    fast_pool1_stride_t: int = 1
    style: str = 'pytorch'
    frozen_stages: int = -1
    slow_inflate_freq: Union[int, Sequence[int]] = (0, 0, 1, 1)
    fast_inflate_freq: Union[int, Sequence[int]] = (1, 1, 1, 1)
    inflate_style: str = '3x1x1'
    norm_cfg: Optional[Dict] = None
    norm_eval: bool = True
    pretrained_slow: Optional[str] = None
    pretrained_fast: Optional[str] = None
    fast_pack: int = 0
    # bit-exact space-to-depth pathway stems (resnet_i3d.stem_conv3d):
    # False / True / 'train'. Default 'train' — measured on v5e, s2d
    # stems cut the train step 143 -> 115.8 ms (-19%; with fast_pack=8,
    # 76.1 ms, +89% clips/s vs the round-2 baseline) but cost ~3% at
    # dense-eval shapes, so only the jitted TRAIN program uses the s2d
    # form (exactness makes the per-phase split legal); DESIGN.md
    # "3-D stem space-to-depth".
    stem_s2d: Union[bool, str] = 'train'
    dtype: Dtype = jnp.float32

    arch_settings = {
        18: (BasicBlock3D, (2, 2, 2, 2)),
        34: (BasicBlock3D, (3, 4, 6, 3)),
        50: (Bottleneck3D, (3, 4, 6, 3)),
        101: (Bottleneck3D, (3, 4, 23, 3)),
        152: (Bottleneck3D, (3, 8, 36, 3)),
    }

    def _stem(self, x, prefix, channels, kernel_t, stride_t, pool_kernel_t,
              pool_stride_t, use_ra, train):
        x = stem_conv3d(channels, (kernel_t, 7, 7), (stride_t, 2, 2),
                        ((kernel_t - 1) // 2, 3, 3), name=f'{prefix}_conv1',
                        dtype=self.dtype, s2d=self.stem_s2d,
                        in_shape=x.shape, train=train)(x)
        x = make_norm(self.norm_cfg, name=f'{prefix}_bn1', dtype=self.dtype)(
            x, use_running_average=use_ra)
        x = nn.relu(x)
        return max_pool3d(x, (pool_kernel_t, 3, 3),
                          (pool_stride_t, 2, 2), (pool_kernel_t // 2, 1, 1))

    def _lateral(self, x_fast, out_ch, name):
        return conv3d(out_ch, (5, 1, 1), (self.alpha, 1, 1), (2, 0, 0),
                      name=name, dtype=self.dtype)(x_fast)

    def _stage(self, x, prefix, block_cls, num_blocks, planes, stage_idx,
               inflate, lateral_in, inplanes, train, pack=0):
        if isinstance(inflate, int):
            inflate = (inflate,) * num_blocks
        for j in range(num_blocks):
            ss = self.spatial_strides[stage_idx] if j == 0 else 1
            cur_in = inplanes + (lateral_in if j == 0 else 0)
            with_ds = (j == 0 and
                       (ss != 1 or cur_in != planes * block_cls.expansion))
            common = dict(
                inplanes=cur_in, planes=planes, spatial_stride=ss,
                temporal_stride=1, dilation=self.dilations[stage_idx],
                with_downsample=with_ds, style=self.style,
                if_inflate=inflate[j] == 1, inflate_style=self.inflate_style,
                norm_cfg=self.norm_cfg, dtype=self.dtype,
                name=f'{prefix}_layer{stage_idx + 1}_{j}')
            if pack:
                x = PackedBottleneck3D(p=pack, **common)(
                    x, train=train, norm_eval=self.norm_eval)
            else:
                x = block_cls(**common)(
                    x, train=train, norm_eval=self.norm_eval)
            inplanes = planes * block_cls.expansion
        return x, inplanes

    def _fast_pack_factor(self, t_fast: int) -> int:
        """Resolve the effective fast-path pack factor (0 = unpacked).

        Packing requires bottleneck blocks, temporal SAME geometry
        (guaranteed: all SlowFast temporal strides are 1) and a fast-path
        length divisible by the factor; silently degrades to the largest
        valid divisor so odd eval clip lengths still benefit.
        """
        p = self.fast_pack
        if not p or self.slow_only:
            return 0
        if self.arch_settings[self.depth][0] is not Bottleneck3D:
            import logging
            logging.getLogger(__name__).warning(
                'fast_pack ignored: depth %d uses basic blocks', self.depth)
            return 0
        while p > 1 and t_fast % p:
            p -= 1
        return p if p > 1 else 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        use_ra = (not train) or self.norm_eval
        two_path = not (self.slow_only or self.fast_only)
        beta = self.beta_inv

        slow_inf = self.slow_inflate_freq if not isinstance(
            self.slow_inflate_freq, int) \
            else (self.slow_inflate_freq,) * self.num_stages
        fast_inf = self.fast_inflate_freq if not isinstance(
            self.fast_inflate_freq, int) \
            else (self.fast_inflate_freq,) * self.num_stages

        x_slow = x_fast = None
        if not self.fast_only:
            x_slow = self._stem(x[:, ::self.tau], 'slow', 64,
                                self.slow_conv1_kernel_t,
                                self.slow_conv1_stride_t,
                                self.slow_pool1_kernel_t,
                                self.slow_pool1_stride_t, use_ra, train)
        pack = 0
        if not self.slow_only:
            x_fast = self._stem(x[:, ::self.tau // self.alpha], 'fast',
                                64 // beta, self.fast_conv1_kernel_t,
                                self.fast_conv1_stride_t,
                                self.fast_pool1_kernel_t,
                                self.fast_pool1_stride_t, use_ra, train)
            pack = self._fast_pack_factor(x_fast.shape[1])
        if two_path:
            lat = self._lateral(x_fast, 64 * 2 // beta, 'slow_conv1_lateral')
            x_slow = jnp.concatenate([x_slow, lat], axis=-1)
        if pack:
            x_fast = pack_t(x_fast, pack)

        outs = []
        slow_inplanes, fast_inplanes = 64, 64 // beta
        lateral_in = 64 * 2 // beta if two_path else 0
        for i, num_blocks in enumerate(stage_blocks):
            planes = 64 * 2 ** i
            if not self.fast_only:
                x_slow, slow_inplanes = self._stage(
                    x_slow, 'slow', block_cls, num_blocks, planes, i,
                    slow_inf[i], lateral_in, slow_inplanes, train)
            if not self.slow_only:
                x_fast, fast_inplanes = self._stage(
                    x_fast, 'fast', block_cls, num_blocks, planes // beta, i,
                    fast_inf[i], 0, fast_inplanes, train, pack=pack)
            x_fast_u = unpack_t(x_fast, pack) if pack else x_fast
            if two_path and i != self.num_stages - 1:
                lat = self._lateral(
                    x_fast_u, fast_inplanes * 2,
                    f'slow_layer{i + 1}_lateral')
                x_slow = jnp.concatenate([x_slow, lat], axis=-1)
                lateral_in = fast_inplanes * 2
            if i in self.out_indices:
                if two_path:
                    outs.append((x_slow, x_fast_u))
                elif self.fast_only:
                    outs.append(x_fast_u)
                else:
                    outs.append(x_slow)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
