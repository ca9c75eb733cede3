"""Fused MVF Pallas kernel (TPU).

Single-pass inference kernel for the MVF hot op: per-channel depthwise
3-taps along T, H and W of an ``(N, T, H, W, C)`` block, summed, plus the
folded-BN affine and HardSwish — one HBM read and one HBM write per element.
This is the designated custom kernel for the reference's hottest inner op
(``/root/reference/codes/models/modules/MVF.py:104-138``).

Kernel shape strategy:
- grid over (N, C-tiles): channels are independent (depthwise), so tiling C
  keeps each block's working set small enough for VMEM at dense-test shapes
  (e.g. layer3 @ ThreeCrop-256: T=8, 32x32, C<=128).
- the three center taps collapse into one fused multiply
  (w_t[1] + w_h[1] + w_w[1]) since they all scale the unshifted x.
- neighbor taps use ``pltpu.roll`` + boundary masking (zero padding
  semantics) accumulated in place — no concatenates, minimal temporaries.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mvf import hard_swish, mvf_conv_sum


def _rolled_tap(x, w_prev, w_next, axis):
    """w_prev*x[i-1] + w_next*x[i+1] along ``axis`` with zero boundaries.

    Shifts are built from slices + a zero slab (Mosaic-friendly for any
    dtype; pltpu.roll only supports 32-bit data)."""
    n = x.shape[axis]
    if n == 1:
        return jnp.zeros_like(x)
    sl_lo = [slice(None)] * x.ndim
    sl_hi = [slice(None)] * x.ndim
    sl_lo[axis] = slice(0, n - 1)
    sl_hi[axis] = slice(1, n)
    zshape = list(x.shape)
    zshape[axis] = 1
    zero = jnp.zeros(zshape, x.dtype)
    prev = jnp.concatenate([zero, x[tuple(sl_lo)]], axis=axis)  # x[i-1]
    acc = prev * w_prev
    nxt = jnp.concatenate([x[tuple(sl_hi)], zero], axis=axis)   # x[i+1]
    return acc + nxt * w_next


def _fused_kernel(x_ref, wt_ref, wh_ref, ww_ref, b_ref, o_ref, *,
                  mode: str, use_hs: bool):
    x = x_ref[0]                      # (T, H, W, Ct)
    wt = wt_ref[:]                    # (3, Ct)
    w_center = wt[1]
    if mode in ('TH', 'THW'):
        w_center = w_center + wh_ref[1]
    if mode == 'THW':
        w_center = w_center + ww_ref[1]
    y = x * w_center
    y = y + _rolled_tap(x, wt[0], wt[2], axis=0)
    if mode in ('TH', 'THW'):
        y = y + _rolled_tap(x, wh_ref[0], wh_ref[2], axis=1)
    if mode == 'THW':
        y = y + _rolled_tap(x, ww_ref[0], ww_ref[2], axis=2)
    y = y + b_ref[0]
    if use_hs:
        y = hard_swish(y)
    o_ref[0] = y


def _pick_c_tile(c: int, t: int, h: int, w: int, itemsize: int) -> int:
    """Largest C tile that keeps ~6 block-sized temporaries under ~8 MB."""
    budget = 8 * 1024 * 1024
    tile = c
    while tile > 128 or 6 * t * h * w * tile * itemsize > budget:
        if tile % 2 != 0 or tile <= 8:
            break
        tile //= 2
    return tile


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

    ct = _pick_c_tile(c, t, h, w, xs.dtype.itemsize)
    n_ct = c // ct

    kernel = functools.partial(_fused_kernel, mode=mode, use_hs=use_hs)
    active = 3 if mode == 'THW' else 2 if mode == 'TH' else 1
    return pl.pallas_call(
        kernel,
        grid=(n, n_ct),
        in_specs=[
            pl.BlockSpec((1, t, h, w, ct), lambda i, j: (i, 0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, h, w, ct), lambda i, j: (i, 0, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xs.shape, dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(xs.size) * (2 * (2 * active + 1) + 6),
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
