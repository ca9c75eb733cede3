"""Temporal Shift Module (TSM).

The reference wires ``TemporalShift`` into MobileNetV2
(``recognizer2d.py:72-83``) but never ships the module itself (its
``modules/__init__.py`` is empty — a dead import path). Implemented here
from the TSM paper semantics the reference clearly intends: shift the first
``1/n_div`` channels backward in time, the next ``1/n_div`` forward, leave
the rest in place; zero padding at clip boundaries.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class TemporalShift(nn.Module):
    """Input/output: (N*T, H, W, C); parameter-free."""
    n_segment: int
    n_div: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nt, h, w, c = x.shape
        t = self.n_segment
        n = nt // t
        fold = c // self.n_div
        x5 = x.reshape(n, t, h, w, c)
        # backward shift: out[t] = x[t+1]
        back = jnp.pad(x5[:, 1:, ..., :fold],
                       [(0, 0), (0, 1), (0, 0), (0, 0), (0, 0)])
        # forward shift: out[t] = x[t-1]
        fwd = jnp.pad(x5[:, :-1, ..., fold:2 * fold],
                      [(0, 0), (1, 0), (0, 0), (0, 0), (0, 0)])
        out = jnp.concatenate([back, fwd, x5[..., 2 * fold:]], axis=-1)
        return out.reshape(nt, h, w, c)
