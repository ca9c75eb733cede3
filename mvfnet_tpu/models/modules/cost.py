"""CoST module (unofficial, FLOPs-comparison variant).

Reference: ``/root/reference/codes/models/modules/CoST.py``. One shared
full 3x3 conv applied over three axis-pairs of the (N, C, T, H, W) volume —
(H,W), (T,W), (T,H) — summed, then BN + ReLU. In the reference it *replaces*
``conv2`` of every non-first bottleneck of selected stages
(``make_CoST``, ``CoST.py:35-52``); the backbone handles that placement.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import BN_EPS, BN_MOMENTUM, TorchBatchNorm


class CoST(nn.Module):
    """Input/output: (N*T, H, W, C)."""
    n_segment: int
    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 norm_eval: bool = False) -> jnp.ndarray:
        nt, h, w, c = x.shape
        n = nt // self.n_segment
        t = self.n_segment

        def w_init(key, shape, dtype=jnp.float32):
            # Normal(0, sqrt(2/(9*C))) (CoST.py:76-80)
            std = (2.0 / (9 * c)) ** 0.5
            return std * jnp.asarray(
                nn.initializers.normal(1.0)(key, shape, dtype))

        kernel = self.param('shift_conv', w_init, (3, 3, c, c))
        kernel = kernel.astype(x.dtype)

        def conv2d_pair(v):
            # v: (M, A, B, C) -> 3x3 same conv over (A, B)
            return jax.lax.conv_general_dilated(
                v, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        x5 = x.reshape(n, t, h, w, c)
        # (H, W) pair: fold T into batch
        y_hw = conv2d_pair(x).reshape(n, t, h, w, c)
        # (T, W) pair: fold H into batch
        v = x5.transpose(0, 2, 1, 3, 4).reshape(n * h, t, w, c)
        y_tw = conv2d_pair(v).reshape(n, h, t, w, c).transpose(0, 2, 1, 3, 4)
        # (T, H) pair: fold W into batch
        v = x5.transpose(0, 3, 1, 2, 4).reshape(n * w, t, h, c)
        y_th = conv2d_pair(v).reshape(n, w, t, h, c).transpose(0, 2, 3, 1, 4)

        y = y_hw + y_tw + y_th
        y = TorchBatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                           dtype=self.dtype, name='bn')(
            y, use_running_average=(not train) or norm_eval)
        y = nn.relu(y)
        return y.reshape(nt, h, w, c)
