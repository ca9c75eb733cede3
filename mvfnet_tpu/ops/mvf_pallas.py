"""Fused MVF Pallas kernel (TPU).

Single-pass inference kernel for the MVF hot op: per-channel depthwise
3-taps along T, H and W of an ``(N, T, H, W, C)`` block, summed, plus the
folded-BN affine and HardSwish — one HBM read and one HBM write per element,
versus 3 convs + BN + activation worth of round-trips in the naive lowering.
This is the designated custom kernel for the reference's hottest inner op
(``/root/reference/codes/models/modules/MVF.py:104-138``).

Layout: C minor (VPU lanes), W second-minor (sublanes). Each grid step
processes one sample's full (T, H, W, C) volume in VMEM; the per-sample
volume at every insertion point of the shipped configs is well under the
VMEM budget (max ~1 MB fp32 at layer3 with 256x256 test crops).

The BN scale is folded into the tap weights by the caller-facing wrapper, so
the kernel computes ``hswish(sum_taps(x) + bias)`` directly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mvf import hard_swish, mvf_conv_sum


def _tap_sum(x, w, axis):
    """w[0]*x[i-1] + w[1]*x[i] + w[2]*x[i+1] along ``axis`` of (T,H,W,C) x,
    zero boundaries, built from concatenates (Mosaic-friendly)."""
    n = x.shape[axis]
    if n == 1:
        # Single element: both neighbors are zero padding.
        return x * w[1]
    sl_lo = [slice(None)] * x.ndim
    sl_hi = [slice(None)] * x.ndim
    sl_lo[axis] = slice(0, n - 1)
    sl_hi[axis] = slice(1, n)
    zshape = list(x.shape)
    zshape[axis] = 1
    zero = jnp.zeros(zshape, x.dtype)
    xm = jnp.concatenate([zero, x[tuple(sl_lo)]], axis=axis)  # x[i-1]
    xp = jnp.concatenate([x[tuple(sl_hi)], zero], axis=axis)  # x[i+1]
    return xm * w[0] + x * w[1] + xp * w[2]


def _fused_kernel(x_ref, wt_ref, wh_ref, ww_ref, b_ref, o_ref, *,
                  mode: str, use_hs: bool):
    x = x_ref[0]                      # (T, H, W, C)
    wt = wt_ref[:]                    # (3, C), broadcast over (T,H,W,C)
    y = _tap_sum(x, wt, axis=0)
    if mode in ('TH', 'THW'):
        y = y + _tap_sum(x, wh_ref[:], axis=1)
    if mode == 'THW':
        y = y + _tap_sum(x, ww_ref[:], axis=2)
    y = y + b_ref[0]
    if use_hs:
        y = hard_swish(y)
    o_ref[0] = y


@functools.partial(jax.jit, static_argnames=('mode', 'use_hs', 'interpret'))
def mvf_fused_pallas(xs: jnp.ndarray,
                     w_t: jnp.ndarray,
                     w_h: Optional[jnp.ndarray],
                     w_w: Optional[jnp.ndarray],
                     scale: jnp.ndarray,
                     bias: jnp.ndarray,
                     mode: str = 'THW',
                     use_hs: bool = True,
                     interpret: bool = False) -> jnp.ndarray:
    """hswish(scale * conv_sum(xs) + bias) in one fused pass.

    xs: (N, T, H, W, C); w_*: (3, C); scale/bias: (C,).
    The affine scale distributes into the (linear) taps:
    scale*conv(x; w) == conv(x; scale*w).
    """
    n, t, h, w, c = xs.shape
    dt = xs.dtype
    scale = scale.astype(jnp.float32)
    wt = (w_t.astype(jnp.float32) * scale).astype(dt)
    wh = ((w_h.astype(jnp.float32) * scale).astype(dt)
          if w_h is not None else wt)
    ww = ((w_w.astype(jnp.float32) * scale).astype(dt)
          if w_w is not None else wt)
    b = bias.astype(dt).reshape(1, c)

    kernel = functools.partial(_fused_kernel, mode=mode, use_hs=use_hs)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, t, h, w, c), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, h, w, c), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xs.shape, dt),
        cost_estimate=pl.CostEstimate(
            flops=int(xs.size) * (6 * (3 if mode == 'THW' else
                                       2 if mode == 'TH' else 1) + 6),
            bytes_accessed=2 * xs.size * xs.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, wt, wh, ww, b)


def mvf_fused_reference(xs, w_t, w_h, w_w, scale, bias, mode='THW',
                        use_hs=True):
    """jnp oracle for the fused kernel (used by tests)."""
    y = mvf_conv_sum(xs, w_t, w_h, w_w, mode)
    y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    return hard_swish(y) if use_hs else y
