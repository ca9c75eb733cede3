"""Space-to-depth re-layout helpers for thin-channel 3-D stages.

X3D's early stages run 24/54-channel tensors at 128^2 spatial resolution
(``/root/reference/codes/models/backbones/resnet_x3d.py:381+``). On TPU the
channel dim is the 128-wide lane dimension: at C=24 every vector tile is
81% padding and every 1x1x1 conv contracts over 24 of 128 MXU lanes —
measured 1.48 TF/s for stage-1 conv1 (vs 196 TF/s peak). Moving 2x2 pixel
blocks into channels (phase-major: channel ``p*C + c`` holds phase
``p = 2*py + px`` of original pixel ``(2i+py, 2j+px)``) lifts the lane
dimension to 4C and the same conv1, expressed as a block-diagonal
(Kronecker) matmul over 4C lanes, measured 0.076 ms vs 0.690 ms — 9x,
even though the expanded matmul does 4x the FLOPs.

Everything here is an exact re-layout (bitwise the same values, float sums
reassociated only inside the MXU): parameters keep their original shapes,
so checkpoints are unaffected.

Used by ``ResNet_X3D`` at inference for stages 1-2; see its docstring for
the per-op formulation (kron 1x1, scatter-kernel 2x2/s2 convs entering and
leaving s2d space for free).
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, T, H, W, C) -> (N, T, H/2, W/2, 4C), phase-major channels."""
    n, t, h, w, c = x.shape
    x = x.reshape(n, t, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(n, t, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(N, T, H', W', 4C) -> (N, T, 2H', 2W', C); inverse of s2d."""
    n, t, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, t, h, w, 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(n, t, 2 * h, 2 * w, c)


def kron4_1x1(w: jnp.ndarray) -> jnp.ndarray:
    """Expand a (1,1,1,C,P) pointwise kernel to its s2d-space equivalent.

    In phase-major s2d layout a per-pixel linear map becomes the block
    diagonal ``I_4 (x) W``: a (1,1,1,4C,4P) dense kernel (zeros included —
    the 4x extra MXU work is far cheaper than the 4x lane underfill it
    removes).
    """
    c, p = w.shape[-2:]
    eye = jnp.eye(4, dtype=w.dtype)
    kk = jnp.einsum('ce,pq->pcqe', w.reshape(c, p), eye)
    return kk.reshape(1, 1, 1, 4 * c, 4 * p)


def enter_kernel_2x2(w: jnp.ndarray) -> jnp.ndarray:
    """Expand a (1,1,1,C,P) pointwise kernel into a (1,2,2,C,4P) kernel.

    Applied as a stride-(1,2,2) dense conv on a *dense* (2H, 2W, C) input,
    it produces the s2d-space (H, W, 4P) output of the pointwise conv —
    i.e. the conv enters s2d layout for free, with no relayout pass:
    ``out[i,j, p*P+o] = sum_c W[c,o] * x[2i+py, 2j+px, c]``.
    """
    c, p = w.shape[-2:]
    w2 = w.reshape(c, p)
    kk = jnp.zeros((1, 2, 2, c, 4 * p), w.dtype)
    for py in range(2):
        for px in range(2):
            ph = 2 * py + px
            kk = kk.at[0, py, px, :, ph * p:(ph + 1) * p].set(w2)
    return kk
