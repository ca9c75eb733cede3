"""Time-to-channel packing for thin-channel 3-D pathways (SlowFast fast path).

SlowFast's fast pathway (``/root/reference/codes/models/backbones/
resnet_i3d_slowfast.py:83-207``) runs 8..256-channel tensors over a long
time axis (T=32 at the 64x1 recipe, beta_inv=8). On TPU the channel dim is
the 128-wide MXU lane dimension: at C=8 every contraction uses 8 of 128
lanes and the fast-path convs measure 2-4 TF/s effective in any dtype
(DESIGN.md round-3 probe). Folding ``p`` consecutive frames into channels
(phase-major: packed channel ``j*C + c`` holds frame phase ``j = t mod p``
of original channel ``c``) lifts the lane dimension to ``p*C``; the probe
measured the stage-1 conv at 3.5 -> 64 TF/s for p=8.

The packed network is *exact* (float sums reassociated only inside the
MXU): parameters keep their original unpacked shapes and are expanded on
the fly into block-structured packed kernels --

- a pointwise/spatial conv (kt=1) becomes a block-diagonal conv,
  ``kron(I_p, W)`` over the channel dims (phase-preserving);
- a temporal conv (kt>1, taps ``delta in [-kt//2, kt//2]``) becomes a
  3-tap conv over the packed time axis whose channel-mixing matrix is
  *banded*: output phase ``i`` draws input phase ``j`` from packed-time
  offset ``m-1`` iff ``(m-1)*p + j == i + delta``.

Dense expansion inflates MACs by ``p`` (each packed kernel slab is a
``p*Cin x p*Cout`` matrix of which only ``1/p`` is structurally nonzero),
but at p=8 the measured rate gain (18x) nets ~2.3x for the fast-path
convs. Zero padding one packed block on each side subsumes the original
temporal SAME padding exactly: band entries that would read beyond the
original pad are structurally zero.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def pack_t(x: Array, p: int) -> Array:
    """(N, T, H, W, C) -> (N, T//p, H, W, p*C), phase-major channels."""
    n, t, h, w, c = x.shape
    if t % p:
        raise ValueError(f'T={t} not divisible by pack factor {p}')
    x = x.reshape(n, t // p, p, h, w, c)
    x = jnp.transpose(x, (0, 1, 3, 4, 2, 5))
    return x.reshape(n, t // p, h, w, p * c)


def unpack_t(x: Array, p: int) -> Array:
    """Inverse of :func:`pack_t`."""
    n, tp, h, w, pc = x.shape
    c = pc // p
    x = x.reshape(n, tp, h, w, p, c)
    x = jnp.transpose(x, (0, 1, 4, 2, 3, 5))
    return x.reshape(n, tp * p, h, w, c)


@lru_cache(maxsize=None)
def _band_selector(p: int, kt: int) -> Tuple[np.ndarray, int]:
    """0/1 selector S[m, i, t, j] = 1 iff (m-1)*p + j == i + (t - kt//2).

    ``i``/``j`` are output/input phases, ``t`` the original temporal tap,
    ``m`` the packed-time tap. Returns (S, t_pad): for kt == 1 the band
    collapses to the m=1 slab and the packed conv needs no temporal taps
    or padding at all (S shape (1, p, 1, p) = I_p).
    """
    half = kt // 2
    if kt == 1:
        # S[0, i, 0, j] = I[i, j]: phase-preserving block diagonal.
        return np.eye(p, dtype=np.float32).reshape(1, p, 1, p), 0
    if half > p:
        raise ValueError(f'temporal kernel {kt} exceeds band for pack {p}')
    s = np.zeros((3, p, kt, p), np.float32)
    for m in range(3):
        for i in range(p):
            for t in range(kt):
                j = i + (t - half) - (m - 1) * p
                if 0 <= j < p:
                    s[m, i, t, j] = 1.0
    return s, 1


def pack_kernel(w: Array, p: int) -> Tuple[Array, int]:
    """Expand an unpacked conv kernel into its packed block-banded form.

    ``w``: (kt, kh, kw, Cin, Cout) -> (kt', kh, kw, p*Cin, p*Cout) with
    kt' = 1 for kt == 1 (block-diagonal) else 3 (banded). Also returns the
    packed temporal padding (0 or 1).
    """
    kt, kh, kw, cin, cout = w.shape
    s, t_pad = _band_selector(p, kt)
    sel = jnp.asarray(s, w.dtype)
    # wp[m, h, w, j*Cin + c, i*Cout + d] = sum_t S[m,i,t,j] * w[t,h,w,c,d]
    wp = jnp.einsum('mitj,thwcd->mhwjcid', sel, w)
    return wp.reshape(sel.shape[0], kh, kw, p * cin, p * cout), t_pad
