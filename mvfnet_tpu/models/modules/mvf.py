"""MVF module — Flax wrapper around the fused multi-view op.

Reference: ``/root/reference/codes/models/modules/MVF.py``. Instead of
runtime module surgery (wrapping a bottleneck's conv1 object), the TPU build
declares MVF as an explicit pre-stage of the bottleneck: the backbone config
says which stages carry it, and the block calls this module on its input
before its first 1x1 conv. Semantics preserved exactly:

- channel split ``[alpha*C | (1-alpha)*C]`` (``MVF.py:59-63``)
- three depthwise 3-tap convs over T / H / W summed (``MVF.py:112-120``);
  ``share=True`` applies the T weights to all active views (``MVF.py:114-116``)
- BN + HardSwish applied *only when* ``use_hs`` (reference quirk,
  ``MVF.py:131-134``)
- untouched channels concatenated back, then the caller's conv1 runs
  (``MVF.py:135-138``)
- new conv weights ~ Normal(0, sqrt(2 / (3*C))), BN gamma=1 beta=0
  (``MVF.py:91-102``)

BatchNorm is implemented inline (torch semantics: biased batch variance for
normalization, unbiased for the running update) so that at inference the
running stats fold into a single affine that XLA fuses into the surrounding
convolutions. A fused Pallas kernel was built and measured in round 1; it
lost to the XLA-fused jnp composition by ~26% end-to-end (a ``pallas_call``
is a materialization boundary the compiler's fusion does not pay) and was
deleted — see docs/DESIGN.md "Pallas study" for the measurements.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.mvf import hard_swish, mvf_conv_sum
from ..common import BN_EPS, BN_MOMENTUM


class MVF(nn.Module):
    """Multi-View Fusion over a folded-time batch.

    Input/output: ``(N*T, H, W, C)`` channels-last; T = ``n_segment``.
    """
    n_segment: int
    in_channels: int
    alpha: float = 0.5
    use_hs: bool = True
    share: bool = False
    mode: str = 'THW'
    # concat=False returns only the transformed channel slice (NT,H,W,cs);
    # the caller then feeds a split pointwise conv and the untouched
    # channels never get rewritten to HBM (a ~14%-of-inference saving
    # measured on v5e — the concat was a full extra activation round trip).
    concat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 norm_eval: bool = False) -> jnp.ndarray:
        # norm_eval freezes this module's BN exactly like the backbone
        # BNs: the reference's bn_eval loop .eval()s EVERY BatchNorm in
        # train() mode, including MVF's self.bn (resnet.py:496-527) —
        # running stats are used and never updated.
        cs = int(self.in_channels * self.alpha)
        if cs == 0:
            return x
        nt, h, w, c = x.shape
        assert c == self.in_channels, (c, self.in_channels)
        n = nt // self.n_segment
        x5 = x.reshape(n, self.n_segment, h, w, c)
        xs = x5[..., :cs]
        xu = x5[..., cs:]

        def tap_init(key, shape, dtype=jnp.float32):
            # fan = prod(kernel) * out_channels = 3 * cs  (MVF.py:95-97)
            std = (2.0 / (3 * cs)) ** 0.5
            return std * jnp.asarray(
                nn.initializers.normal(1.0)(key, shape, dtype))

        w_t = self.param('shift_conv', tap_init, (3, cs))
        w_h = w_w = None
        if self.mode in ('TH', 'THW'):
            w_h = w_t if self.share else self.param('h_conv', tap_init, (3, cs))
        if self.mode == 'THW':
            w_w = w_t if self.share else self.param('w_conv', tap_init, (3, cs))

        if not self.use_hs:
            # Reference applies neither BN nor activation when use_hs=False
            # (MVF.py:131-134).
            y = mvf_conv_sum(xs, w_t, w_h, w_w, self.mode)
        else:
            gamma = self.param('bn_scale', nn.initializers.ones, (cs,))
            beta = self.param('bn_bias', nn.initializers.zeros, (cs,))
            ra_mean = self.variable('batch_stats', 'bn_mean',
                                    lambda: jnp.zeros((cs,), jnp.float32))
            ra_var = self.variable('batch_stats', 'bn_var',
                                   lambda: jnp.ones((cs,), jnp.float32))
            if train and not norm_eval:
                y = mvf_conv_sum(xs, w_t, w_h, w_w, self.mode)
                # stats in at-least-f32 (not a hard f32 cast: a float64
                # input keeps float64 — needed by the f64 train-trajectory
                # parity tests; bf16 still promotes to f32)
                yf = y.astype(jnp.promote_types(jnp.float32, y.dtype))
                axes = (0, 1, 2, 3)
                mean = jnp.mean(yf, axis=axes)
                # stable (torch) variance form: E[(x-mean)^2], not
                # E[x^2]-E[x]^2 — see make_norm's use_fast_variance note
                var = jnp.mean(jnp.square(yf - mean), axis=axes)
                count = yf.size // cs
                unbiased = var * (count / max(count - 1, 1))
                if not self.is_initializing():
                    ra_mean.value = (BN_MOMENTUM * ra_mean.value
                                     + (1 - BN_MOMENTUM) * mean)
                    ra_var.value = (BN_MOMENTUM * ra_var.value
                                    + (1 - BN_MOMENTUM) * unbiased)
                inv = gamma / jnp.sqrt(var + BN_EPS)
                y = (yf - mean) * inv + beta
                y = hard_swish(y).astype(x.dtype)
            else:
                # Fold running stats into one affine. XLA fuses the shifted
                # multiply-adds + affine + hardswish into the surrounding
                # convolutions with no materialization (measured ~26% faster
                # end-to-end than a hand-written Pallas kernel, since
                # deleted — docs/DESIGN.md "Pallas study").
                scale = gamma / jnp.sqrt(ra_var.value + BN_EPS)
                bias = beta - ra_mean.value * scale
                y = mvf_conv_sum(xs, w_t, w_h, w_w, self.mode)
                y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
                y = hard_swish(y)

        if not self.concat:
            return y.astype(x.dtype).reshape(nt, h, w, cs)
        out = jnp.concatenate([y.astype(x.dtype), xu], axis=-1)
        return out.reshape(nt, h, w, c)

