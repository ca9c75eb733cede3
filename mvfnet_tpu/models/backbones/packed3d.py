"""Time-packed 3-D ResNet blocks (SlowFast fast-pathway acceleration).

These mirror :class:`resnet_i3d.Bottleneck3D` exactly — same parameter
tree (module/param names and unpacked shapes, so checkpoints and golden
fixtures are unaffected), same math — but run on a time-packed activation
layout ``(N, T/p, H, W, p*C)`` (see :mod:`mvfnet_tpu.ops.tpack`). Unpacked
kernels are expanded on the fly into block-banded packed kernels; BatchNorm
operates on a ``(..., p, C)`` view so its statistics reduce over exactly
the same elements as the unpacked form (train mode included).

Reference semantics being reproduced:
``/root/reference/codes/models/backbones/resnet_i3d_slowfast.py:83-207``
(fast-pathway bottlenecks; all temporal strides are 1 in SlowFast).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ...ops.tpack import pack_kernel
from ..common import make_norm

Dtype = Any


class PackedConv3D(nn.Module):
    """torch-semantics Conv3d on a time-packed (N,T/p,H,W,p*C) tensor.

    Declares the *unpacked* ``kernel`` parameter (kt, kh, kw, Cin, Cout)
    — identical to :func:`resnet_i3d.conv3d` / ``nn.Conv`` — and expands
    it per call. Temporal stride must be 1; temporal SAME padding is
    subsumed by the banded expansion (one packed block of zeros).
    """

    features: int
    kernel: Tuple[int, int, int]
    p: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Optional[Tuple[int, int, int]] = None
    dilation: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        if self.stride[0] != 1:
            raise ValueError('PackedConv3D requires temporal stride 1')
        pad = self.padding
        if pad is None:
            pad = tuple((k - 1) // 2 for k in self.kernel)
        if kt > 1 and pad[0] != (kt - 1) // 2:
            raise ValueError('PackedConv3D requires temporal SAME padding')
        cin = x.shape[-1] // self.p
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (kt, kh, kw, cin, self.features), jnp.float32)
        wp, t_pad = pack_kernel(w.astype(self.dtype), self.p)
        return lax.conv_general_dilated(
            x.astype(self.dtype), wp,
            (1, self.stride[1], self.stride[2]),
            ((t_pad, t_pad), (pad[1], pad[1]), (pad[2], pad[2])),
            rhs_dilation=(1, self.dilation[1], self.dilation[2]),
            dimension_numbers=('NTHWC', 'THWIO', 'NTHWC'))


class PackedBottleneck3D(nn.Module):
    """Time-packed twin of :class:`resnet_i3d.Bottleneck3D`.

    Same fields, same submodule names (conv1/bn1/conv2/bn2/conv3/bn3,
    downsample_conv/downsample_bn), same parameter shapes. ``avg_down`` /
    ``avd`` / non-local are not used by any fast pathway and unsupported.
    """

    inplanes: int
    planes: int
    p: int = 8
    spatial_stride: int = 1
    temporal_stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    style: str = 'pytorch'
    if_inflate: bool = True
    inflate_style: str = '3x1x1'
    norm_cfg: Optional[Dict] = None
    dtype: Dtype = jnp.float32

    expansion = 4

    def _norm(self, x, name, use_ra):
        n, t, h, w, pc = x.shape
        c = pc // self.p
        xr = x.reshape(n, t, h, w, self.p, c)
        xr = make_norm(self.norm_cfg, name=name, dtype=self.dtype)(
            xr, use_running_average=use_ra)
        return xr.reshape(n, t, h, w, pc)

    @nn.compact
    def __call__(self, x, train: bool = False, norm_eval: bool = False):
        if self.temporal_stride != 1:
            raise ValueError('PackedBottleneck3D requires temporal stride 1')
        use_ra = (not train) or norm_eval
        ss = self.spatial_stride
        if self.style == 'pytorch':
            c1_s, c2_s = 1, ss
        else:
            c1_s, c2_s = ss, 1

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

        identity = x
        out = PackedConv3D(self.planes, k1, self.p, (1, c1_s, c1_s), p1,
                           name='conv1', dtype=self.dtype)(x)
        out = self._norm(out, 'bn1', use_ra)
        out = nn.relu(out)
        out = PackedConv3D(self.planes, k2, self.p, (1, c2_s, c2_s), p2,
                           dilation=(1, self.dilation, self.dilation),
                           name='conv2', dtype=self.dtype)(out)
        out = self._norm(out, 'bn2', use_ra)
        out = nn.relu(out)
        out = PackedConv3D(self.planes * self.expansion, (1, 1, 1), self.p,
                           name='conv3', dtype=self.dtype)(out)
        out = self._norm(out, 'bn3', use_ra)

        if self.with_downsample:
            identity = PackedConv3D(
                self.planes * self.expansion, (1, 1, 1), self.p,
                (1, ss, ss), name='downsample_conv', dtype=self.dtype)(x)
            identity = self._norm(identity, 'downsample_bn', use_ra)
        return nn.relu(out + identity)
