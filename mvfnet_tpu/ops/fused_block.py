"""Fused eval-time ResNet bottleneck — a measured NEGATIVE result.

This kernel collapses a whole stride-1 residual bottleneck
(``/root/reference/codes/models/backbones/resnet.py:104-244``)

    out = relu(x + bn3(conv3(relu(bn2(conv2(relu(bn1(conv1(x)))))))))

into a single ``pallas_call`` at eval time (BatchNorm folded into the conv
weights): the input frame is read from HBM once, all intermediates live in
VMEM, the result is written once.  The grid iterates over frames (the
folded ``B*T`` batch axis); one frame's full spatial extent fits in VMEM at
every R50/R101 stage-1/2 shape, so the 3x3 conv needs no halo exchange —
it runs as shifted MXU matmuls over a zero-padded VMEM scratch.

**It loses to XLA and is NOT wired into the model.** Measured on v5e at
the flagship dense-test shapes (``tools/bench_fused_block.py``):

    layer1 mid-block (240,64,64,256/64):  XLA 2.12 ms | Pallas 4.14 ms
    layer2 mid-block (240,32,32,512/128): XLA 1.09 ms | Pallas 2.00 ms

Why (diagnosed in tools/bench_partition.py + DESIGN.md "Pallas study"):
the premise — that these blocks are HBM-bound and fusion would win back
bandwidth — is wrong on this hardware.  XLA reaches ~1.5 TB/s effective
HBM bandwidth and spreads conv work across all four MXUs even at 64-wide
output channels (63-67 TF/s on the layer1 block), so the block is
*compute*-bound on MXU lane fill, which fusion does not change.  Inside a
Pallas kernel, a matmul with N<=256 output lanes engages a single MXU
(~31 TF/s ceiling, measured across tilings), and in-kernel VMEM copies
move ~260 GB/s through the VPU — both structurally below what the XLA conv
emitter gets for the same math.  Pallas wins when a kernel removes a real
fusion barrier (see the scaling-book guidance); here the barrier XLA
cannot cross (conv->conv chaining) costs less than the MXU scheduling
freedom a hand kernel gives up.

Kept as a tested, reproducible study: the dispatcher never selects Pallas
in the model (the hot path is the XLA graph); ``bottleneck_eval`` exists
for the microbenchmark and regression tests only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test/debug override: None = auto (pallas on TPU), 'pallas', 'jnp'.
# Tests force 'pallas' together with interpret mode to exercise the kernel
# on CPU.
FORCE: Optional[str] = None
INTERPRET: bool = False

# Leave headroom below the ~16 MB/core VMEM for double-buffered pipelines.
_VMEM_BUDGET = 12 * 1024 * 1024


def fold_bn(kernel: jnp.ndarray, scale, bias, mean, var,
            eps: float = 1e-5):
    """Fold eval-time BatchNorm into the preceding conv.

    ``bn(conv(x)) == conv'(x) + b'`` with ``W' = W * s/sqrt(v+eps)`` per
    output channel and ``b' = b - m * s/sqrt(v+eps)``.  Computed in fp32;
    the caller casts to the compute dtype.
    """
    inv = scale * jax.lax.rsqrt(var + eps)
    return kernel * inv, bias - mean * inv


# Inner 3x3-conv formulation: 'taps9' = 9 accumulating matmuls (K=Cm),
# 'im2col' = one matmul per chunk over concatenated windows (K=9*Cm).
CONV2_MODE = 'im2col'
ROW_CHUNK = 16


def _row_chunk(hh: int) -> int:
    """Rows per inner chunk: bounds live fp32 accumulators to ~1 MB."""
    for c in (ROW_CHUNK, 8, 4, 2, 1):
        if hh % c == 0:
            return c
    return 1


def _bottleneck_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                       b3_ref, o_ref, hp_ref):
    """One frame per grid step; all matmuls row-chunked to bound VMEM.

    ``hp_ref`` is a zero-padded VMEM scratch holding the full conv1+relu
    output so the 3x3 conv (9 shifted MXU matmuls) needs no halo exchange.
    fp32 accumulators only ever cover one row chunk.
    """
    _, hh, ww, cin = x_ref.shape
    cm = w1_ref.shape[1]
    rc = _row_chunk(hh)
    hp_ref[...] = jnp.zeros_like(hp_ref)
    for r0 in range(0, hh, rc):
        xa = x_ref[0, r0:r0 + rc].reshape(rc * ww, cin)
        h = jnp.dot(xa, w1_ref[...], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b1_ref[...], 0.0).astype(hp_ref.dtype)
        hp_ref[1 + r0:1 + r0 + rc, 1:ww + 1, :] = h.reshape(rc, ww, cm)
    for r0 in range(0, hh, rc):
        if CONV2_MODE == 'im2col':
            wins = [hp_ref[r0 + dy:r0 + dy + rc, dx:dx + ww, :]
                    .reshape(rc * ww, cm)
                    for dy in range(3) for dx in range(3)]
            patches = jnp.concatenate(wins, axis=-1)
            acc = jnp.dot(patches, w2_ref[...].reshape(9 * cm, cm),
                          preferred_element_type=jnp.float32) + b2_ref[...]
        else:
            acc = jnp.zeros((rc * ww, cm), jnp.float32) + b2_ref[...]
            for dy in range(3):
                for dx in range(3):
                    win = hp_ref[r0 + dy:r0 + dy + rc, dx:dx + ww, :]
                    acc = acc + jnp.dot(win.reshape(rc * ww, cm),
                                        w2_ref[dy, dx],
                                        preferred_element_type=jnp.float32)
        h2 = jnp.maximum(acc, 0.0).astype(hp_ref.dtype)
        o = jnp.dot(h2, w3_ref[...], preferred_element_type=jnp.float32)
        xa = x_ref[0, r0:r0 + rc].reshape(rc * ww, cin)
        o = o + b3_ref[...] + xa.astype(jnp.float32)
        o_ref[0, r0:r0 + rc] = jnp.maximum(o, 0.0).reshape(
            rc, ww, cin).astype(o_ref.dtype)


def _vmem_bytes(n, h, w, cin, cm, itemsize):
    rc = _row_chunk(h)
    lanes = max(cm, 128)                               # lane-padded minor dim
    x_blk = h * w * cin * itemsize
    hp = (h + 2) * (w + 2) * lanes * itemsize          # padded conv1 scratch
    chunk = rc * w * (cin * 4                          # fp32 conv3 acc
                      + cin * itemsize                 # residual reload
                      + 3 * lanes * 4)                 # conv1/conv2 f32 accs
    weights = (cin * cm + 9 * cm * cm + cm * cin) * itemsize
    # input + output double-buffered by the pipeline
    return 4 * x_blk + hp + chunk + weights


def bottleneck_eval_pallas(x, w1, b1, w2, b2, w3, b3):
    n, h, w, cin = x.shape
    cm = w1.shape[-1]
    flops = 2 * n * h * w * (cin * cm + 9 * cm * cm + cm * cin)
    return pl.pallas_call(
        _bottleneck_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((cin, cm), lambda i: (0, 0)),
            pl.BlockSpec((1, cm), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, cm, cm), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, cm), lambda i: (0, 0)),
            pl.BlockSpec((cm, cin), lambda i: (0, 0)),
            pl.BlockSpec((1, cin), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, cm), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=INTERPRET,
    )(x, w1, b1, w2, b2, w3, b3)


def bottleneck_eval_jnp(x, w1, b1, w2, b2, w3, b3):
    """Folded-BN composition for non-TPU backends (same math, XLA convs)."""
    dn = ('NHWC', 'HWIO', 'NHWC')
    h = jax.lax.conv_general_dilated(
        x, w1.reshape(1, 1, *w1.shape), (1, 1), 'VALID',
        dimension_numbers=dn)
    h = jnp.maximum(h + b1.reshape(-1).astype(h.dtype), 0.0).astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        h, w2, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
    h = jnp.maximum(h + b2.reshape(-1).astype(h.dtype), 0.0).astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        h, w3.reshape(1, 1, *w3.shape), (1, 1), 'VALID',
        dimension_numbers=dn)
    out = h + b3.reshape(-1).astype(h.dtype) + x.astype(h.dtype)
    return jnp.maximum(out, 0.0).astype(x.dtype)


def use_pallas(shape, cm, dtype) -> bool:
    """Measured loser: never auto-selected (see module docstring).

    ``FORCE='pallas'`` (tests/microbenchmarks) still routes to the kernel,
    subject to the VMEM guard."""
    if FORCE != 'pallas':
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    n, h, w, cin = shape
    if h < 3 or w < 3:
        return False
    return _vmem_bytes(n, h, w, cin, cm,
                       jnp.dtype(dtype).itemsize) <= _VMEM_BUDGET


def bottleneck_eval(x, w1, b1, w2, b2, w3, b3):
    """Dispatch: fused Pallas kernel on TPU, folded jnp elsewhere.

    Weights are the BN-folded conv kernels — ``w1 (Cin,Cm)``, ``w2
    (3,3,Cm,Cm)``, ``w3 (Cm,Cin)`` — cast to the compute dtype; biases are
    fp32 ``(1, C)`` rows.
    """
    if use_pallas(x.shape, w1.shape[-1], x.dtype):
        return bottleneck_eval_pallas(x, w1, b1, w2, b2, w3, b3)
    return bottleneck_eval_jnp(x, w1, b1, w2, b2, w3, b3)
