#!/usr/bin/env python3
"""Microbenchmark: fused Pallas bottleneck vs the XLA conv chain.

Times one residual bottleneck at the flagship dense-test shapes
(layer1: 240x64x64x256/64, layer2: 240x32x32x512/128, bf16) using the
chained-fori_loop methodology from bench.py (per-iteration perturbation,
two trip counts differenced to cancel fixed dispatch overhead).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from mvfnet_tpu.ops import fused_block as fb

K1, K2, REPS = 2, 10, 3


def time_fn(fn, x, args):
    @jax.jit
    def run(x, k):
        def body(i, acc):
            y = fn(x + i.astype(x.dtype) * 1e-6, *args)
            return acc + jnp.mean(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    def best(k):
        k = jnp.asarray(k, jnp.int32)
        float(run(x, k))
        b = float('inf')
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(run(x, k))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(K2) - best(K1)) / (K2 - K1)


def bench_shape(name, n, h, w, cin, cm, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, cin), dtype)
    w1 = jnp.asarray(rng.randn(cin, cm) * 0.05, dtype)
    w2 = jnp.asarray(rng.randn(3, 3, cm, cm) * 0.05, dtype)
    w3 = jnp.asarray(rng.randn(cm, cin) * 0.05, dtype)
    b1 = jnp.asarray(rng.randn(1, cm), jnp.float32)
    b2 = jnp.asarray(rng.randn(1, cm), jnp.float32)
    b3 = jnp.asarray(rng.randn(1, cin), jnp.float32)
    args = (w1, b1, w2, b2, w3, b3)

    t_jnp = time_fn(fb.bottleneck_eval_jnp, x, args)
    t_pal = time_fn(fb.bottleneck_eval_pallas, x, args)
    gflop = 2 * n * h * w * (cin * cm + 9 * cm * cm + cm * cin) / 1e9
    gb = 2 * x.size * x.dtype.itemsize / 1e9
    print(f'{name}: xla {t_jnp*1e3:.3f} ms ({gflop/t_jnp/1e3:.1f} TF/s) | '
          f'pallas {t_pal*1e3:.3f} ms ({gflop/t_pal/1e3:.1f} TF/s, '
          f'{gb/t_pal*1e3:.0f} GB/s eff) | speedup {t_jnp/t_pal:.2f}x')

    y1 = fb.bottleneck_eval_jnp(x, *args)
    y2 = fb.bottleneck_eval_pallas(x, *args)
    err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                - y2.astype(jnp.float32))))
    print(f'  max abs diff vs jnp: {err:.4g}')


if __name__ == '__main__':
    print('backend:', jax.default_backend())
    bench_shape('layer1 blk (240,64,64,256/64)', 240, 64, 64, 256, 64)
    bench_shape('layer2 blk (240,32,32,512/128)', 240, 32, 32, 512, 128)
