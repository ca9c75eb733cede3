"""Unfold-based local self-attention (non-local block).

Reference: ``/root/reference/codes/models/modules/local_attention.py``.
For every spatial site, attention runs over the T x K x K (default 3x3)
neighborhood tube: qkv from one 1x1x1 conv, affinity over the T*K*K
positions (dot_product mean or softmax), fold-style overlap-add back, 1x1x1
out-projection + BN, residual.

Channels-last: x is (N, T, H, W, C). Unfold/fold are expressed as K*K
spatial shifts (zero-padded), which XLA fuses — no gather/scatter.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import BN_EPS, BN_MOMENTUM, TorchBatchNorm


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[..., i, j, :] = x[..., i+dy, j+dx, :] with zero boundaries.
    Spatial axes are -3 (H) and -2 (W)."""
    pad = [(0, 0)] * x.ndim
    h_ax, w_ax = x.ndim - 3, x.ndim - 2
    pad[h_ax] = (max(-dy, 0), max(dy, 0))
    pad[w_ax] = (max(-dx, 0), max(dx, 0))
    y = jnp.pad(x, pad)
    sl = [slice(None)] * x.ndim
    h, w = x.shape[h_ax], x.shape[w_ax]
    sl[h_ax] = slice(max(dy, 0), max(dy, 0) + h)
    sl[w_ax] = slice(max(dx, 0), max(dx, 0) + w)
    return y[tuple(sl)]


class LocalAttention(nn.Module):
    """dim -> hidden qkv local attention with residual (reference
    ``local_attention.py:12-166``)."""
    dim: int
    hidden: int
    kernel_size: int = 3
    padding: int = 1
    instantiation: str = 'dot_product'
    use_time_shift: bool = False
    time_weighting_size: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 norm_eval: bool = False) -> jnp.ndarray:
        # x: (N, T, H, W, C)
        n, t, h, w, c = x.shape
        assert c == self.dim
        k = self.kernel_size
        k2 = k * k
        identity = x

        qkv = nn.Conv(self.hidden * 3, (1, 1, 1), use_bias=True,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name='conv_in')(x)
        theta, phi, g = jnp.split(qkv, 3, axis=-1)

        def time_shift(v):
            # reference ``_time_shift`` (local_attention.py:156-164), applied
            # inside ``_unfold_and_view`` to each of theta/phi/g AFTER the
            # qkv projection: first half of the hidden channels shifted +1
            # in time (zero-padded front), second half untouched.
            half = v.shape[-1] // 2
            shifted = jnp.pad(v[..., :half],
                              [(0, 0), (1, 0), (0, 0), (0, 0), (0, 0)]
                              )[:, :t]
            return jnp.concatenate([shifted, v[..., half:]], axis=-1)

        def unfold(v):
            # (N, T, H, W, hid) -> (N, T*K2, H*W, hid)
            if self.use_time_shift:
                v = time_shift(v)
            offs = [_shift2d(v, dy, dx)
                    for dy in range(-self.padding, k - self.padding)
                    for dx in range(-self.padding, k - self.padding)]
            u = jnp.stack(offs, axis=2)           # (N, T, K2, H, W, hid)
            return u.reshape(n, t * k2, h * w, self.hidden)

        theta_u, phi_u, g_u = unfold(theta), unfold(phi), unfold(g)
        # affinity over the T*K2 tube positions, per spatial site
        attn = jnp.einsum('npsc,nqsc->npqs', theta_u, phi_u)
        if self.instantiation == 'softmax':
            attn = attn * (self.hidden ** -0.5)
            attn = jax.nn.softmax(attn, axis=2)
        elif self.instantiation == 'dot_product':
            attn = attn / (t * k2)
        else:
            raise NotImplementedError(self.instantiation)
        if self.time_weighting_size is not None:
            tw = self.param('time_weighting', nn.initializers.ones,
                            tuple(self.time_weighting_size))
            attn = attn * tw
        out_u = jnp.einsum('npqs,nqsc->npsc', attn, g_u)
        # fold (overlap-add): inverse shifts summed
        out_u = out_u.reshape(n, t, k2, h, w, self.hidden)
        out = jnp.zeros((n, t, h, w, self.hidden), out_u.dtype)
        i = 0
        for dy in range(-self.padding, k - self.padding):
            for dx in range(-self.padding, k - self.padding):
                out = out + _shift2d(out_u[:, :, i], -dy, -dx)
                i += 1
        out = nn.Conv(self.dim, (1, 1, 1), use_bias=True, dtype=self.dtype,
                      param_dtype=jnp.float32, name='conv_out')(out)
        out = TorchBatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, name='bn')(
            out, use_running_average=(not train) or norm_eval)
        return identity + out


def build_nonlocal_block(cfg: Dict, dtype=jnp.float32) -> LocalAttention:
    """Reference ``build_nonlocal_block`` (``local_attention.py:241-260``)."""
    cfg = dict(cfg)
    dim = cfg['in_channels']
    embed_dim = cfg.get('embed_dim') or dim // 2
    return LocalAttention(dim=dim, hidden=embed_dim, dtype=dtype)


def nonlocal_block_indices(num_blocks: int, num_nl: int) -> Tuple[int, ...]:
    """Which block indices of a stage get a non-local wrapper.

    Replicates the reference's float-modulo selection
    (``make_non_local``, ``local_attention.py:191-222``):
    ``idx % (len/num) == (len/num) - 1`` — which matches odd indices when
    len/num is integral and selects *nothing* when it isn't (e.g. R101
    layer3: 23/3). Quirk preserved for parity.
    """
    stride = num_blocks / num_nl
    return tuple(i for i in range(num_blocks) if i % stride == stride - 1)
