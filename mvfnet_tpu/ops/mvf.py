"""Multi-View Fusion core op — TPU-native functional implementations.

The reference MVF module (``/root/reference/codes/models/modules/MVF.py:104-138``)
applies three depthwise 3-tap Conv3d's to the first ``alpha``-fraction of
channels of an ``(N, C, T, H, W)`` tensor — one tap each along T, H, W —
sums the three views, then BatchNorm3d + HardSwish, concatenates the
untouched channels back, and hands the result to the wrapped 1x1 conv.

Here the op is a pure function on channels-last ``(N, T, H, W, C)`` blocks
(C minor = VPU-lane friendly). A depthwise 3-tap along an axis is expressed
as three shifted multiply-adds — XLA fuses these into a single elementwise
pass (and further into the surrounding convolutions); a hand-written Pallas
variant measured ~26% slower end-to-end and was deleted (docs/DESIGN.md,
"Pallas study").

Weight convention: each view's weights are ``(3, C)`` — ``w[0]`` multiplies
the previous element (index-1), ``w[1]`` the center, ``w[2]`` the next,
matching torch ``Conv3d(groups=C, kernel_size=3, padding=1)`` semantics with
zero boundaries.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def hard_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """relu6(x + 3) / 6 (reference ``se_module.py:5-13``)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hard_swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * hard_sigmoid(x) (reference ``se_module.py:16-24``)."""
    return x * hard_sigmoid(x)


def _shift(x: jnp.ndarray, axis: int, delta: int) -> jnp.ndarray:
    """Return x shifted so out[i] = x[i + delta], zero-padded at boundaries.

    delta=-1 -> out[i] = x[i-1]; delta=+1 -> out[i] = x[i+1].
    """
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if delta == -1:
        pad[axis] = (1, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
    elif delta == 1:
        pad[axis] = (0, 1)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(1, n + 1)
    else:
        raise ValueError(delta)
    return jax.lax.pad(x, jnp.zeros((), x.dtype),
                       [(p[0], p[1], 0) for p in pad])[tuple(sl)]


def dw3(x: jnp.ndarray, w: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Depthwise 3-tap conv along ``axis`` of channels-last x.

    x: (..., C); w: (3, C). out[i] = w0*x[i-1] + w1*x[i] + w2*x[i+1].
    """
    w = w.astype(x.dtype)
    return (_shift(x, axis, -1) * w[0]
            + x * w[1]
            + _shift(x, axis, 1) * w[2])


def mvf_conv_sum(x: jnp.ndarray,
                 w_t: Optional[jnp.ndarray],
                 w_h: Optional[jnp.ndarray],
                 w_w: Optional[jnp.ndarray],
                 mode: str = 'THW') -> jnp.ndarray:
    """Sum of per-view depthwise 3-taps on x: (N, T, H, W, C).

    mode selects active views (reference ``MVF.py:112-129``). ``share=True``
    in the reference means w_h / w_w alias w_t — callers just pass the same
    array.
    """
    assert x.ndim == 5, f'expected (N,T,H,W,C), got {x.shape}'
    y = dw3(x, w_t, axis=1)
    if mode in ('TH', 'THW'):
        y = y + dw3(x, w_h, axis=2)
    if mode == 'THW':
        y = y + dw3(x, w_w, axis=3)
    return y


def mvf_fused_inference(x: jnp.ndarray,
                        w_t: Optional[jnp.ndarray],
                        w_h: Optional[jnp.ndarray],
                        w_w: Optional[jnp.ndarray],
                        scale: jnp.ndarray,
                        bias: jnp.ndarray,
                        mode: str = 'THW',
                        use_hs: bool = True) -> jnp.ndarray:
    """conv-sum -> folded-BN affine -> hardswish, in one fusable expression.

    ``scale``/``bias`` are the BN running-stat fold:
    scale = gamma / sqrt(var + eps); bias = beta - mean * scale.
    When ``use_hs`` is False the reference skips BN *and* activation entirely
    (``MVF.py:131-134``) — callers must then use :func:`mvf_conv_sum` instead.
    """
    y = mvf_conv_sum(x, w_t, w_h, w_w, mode)
    y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    if use_hs:
        y = hard_swish(y)
    return y
