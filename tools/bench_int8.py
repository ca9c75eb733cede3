#!/usr/bin/env python3
"""Int8-vs-bf16 MXU microbenchmark behind DESIGN.md "Int8 dense-test".

Times matmuls (``lax.dot``) and convolutions (``lax.conv_general_dilated``)
with int8 operands + ``preferred_element_type=int32`` against bf16, at
shapes representative of this model family. Methodology: K invocations in
one jitted ``fori_loop``, differenced across two K values to cancel the
relay's fixed fetch overhead. The loop body feeds the carried accumulator
back into one input element — a *data dependence*, because an additive
scalar perturbation distributes over dot/conv and XLA hoists the whole
matmul out of the loop (first version of this bench measured 446 "TOP/s"
on a 394-TOPS chip that way).

Usage: python tools/bench_int8.py [--mode matmul|conv|both]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

MATMULS = [  # (name, M, K, N)
    ('mm_4096cubed', 4096, 4096, 4096),
    ('mm_M15360_K256_N256', 15360, 256, 256),
    ('mm_M15360_K2048_N512', 15360, 2048, 512),
    ('mm_M3840_K512_N2048', 3840, 512, 2048),
    ('mm_M15360_K576_N64_layer1_3x3', 15360, 576, 64),
    ('mm_M15360_K64_N256_layer1_conv3', 15360, 64, 256),
]
CONVS = [  # (name, N, H, W, Cin, Cout, kh, kw)
    ('conv_layer1_3x3', 240, 64, 64, 64, 64, 3, 3),
    ('conv_layer3_3x3', 240, 16, 16, 256, 256, 3, 3),
    ('conv_layer3_1x1', 240, 16, 16, 1024, 256, 1, 1),
]
CONV3DS = [  # (name, N, T, H, W, Cin, Cout, kt, kh, kw)
    ('conv3d_slowfast_fast_3x3x3', 3, 64, 56, 56, 8, 8, 3, 3, 3),
    ('conv3d_slowfast_fast_1x1', 3, 64, 28, 28, 64, 16, 1, 1, 1),
    ('conv3d_i3d_3x1x1', 6, 8, 14, 14, 1024, 256, 3, 1, 1),
    ('conv3d_i3d_1x3x3', 6, 8, 14, 14, 256, 256, 1, 3, 3),
]


def _bench(make_x, w, op, flops, kpair, reps):
    import jax
    import jax.numpy as jnp

    x = make_x()

    @jax.jit
    def run(x, w, kk):
        def body(i, carry):
            acc, x = carry
            # loop-carry dependence: not hoistable, not distributable
            val = (acc % 7.0)
            val = (val.astype(jnp.int32).astype(x.dtype)
                   if x.dtype == jnp.int8 else val.astype(x.dtype))
            xi = x.at[(0,) * x.ndim].set(val)
            y = op(xi, w)
            return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30, x
        acc, _ = jax.lax.fori_loop(0, kk, body,
                                   (jnp.zeros((), jnp.float32), x))
        return acc

    def timeit(k):
        kk = jnp.asarray(k, jnp.int32)
        float(run(x, w, kk))
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, w, kk))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timeit(kpair[0]), timeit(kpair[1])
    return flops / ((t2 - t1) / (kpair[1] - kpair[0]))


def bench_matmul(name, M, K, N, kpair, reps):
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(0)
    fl = 2 * M * K * N
    out = {'metric': name, 'unit': 'TF/s (int8: TOP/s)'}
    wb = jax.jit(lambda k: jax.random.normal(k, (K, N), jnp.bfloat16))(key)
    out['bf16'] = round(_bench(
        lambda: jax.jit(lambda k: jax.random.normal(
            k, (M, K), jnp.bfloat16))(key),
        wb, lambda a, b: jnp.dot(a, b), fl, kpair, reps) / 1e12, 1)
    w8 = jax.jit(lambda k: jax.random.randint(
        k, (K, N), -127, 127, jnp.int8))(key)
    out['int8'] = round(_bench(
        lambda: jax.jit(lambda k: jax.random.randint(
            k, (M, K), -127, 127, jnp.int8))(key),
        w8, lambda a, b: jax.lax.dot(
            a, b, preferred_element_type=jnp.int32), fl, kpair, reps) / 1e12,
        1)
    print(json.dumps(out), flush=True)


def bench_conv(name, N, H, W, Cin, Cout, kh, kw, kpair, reps):
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(0)
    fl = 2 * N * H * W * Cin * Cout * kh * kw
    dn = ('NHWC', 'HWIO', 'NHWC')
    out = {'metric': name, 'unit': 'TF/s (int8: TOP/s)'}

    def conv(pet):
        return lambda a, b: jax.lax.conv_general_dilated(
            a, b, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=pet)

    wb = jax.jit(lambda k: jax.random.normal(
        k, (kh, kw, Cin, Cout), jnp.bfloat16))(key)
    out['bf16'] = round(_bench(
        lambda: jax.jit(lambda k: jax.random.normal(
            k, (N, H, W, Cin), jnp.bfloat16))(key),
        wb, conv(None), fl, kpair, reps) / 1e12, 1)
    w8 = jax.jit(lambda k: jax.random.randint(
        k, (kh, kw, Cin, Cout), -127, 127, jnp.int8))(key)
    out['int8'] = round(_bench(
        lambda: jax.jit(lambda k: jax.random.randint(
            k, (N, H, W, Cin), -127, 127, jnp.int8))(key),
        w8, conv(jnp.int32), fl, kpair, reps) / 1e12, 1)
    print(json.dumps(out), flush=True)


def bench_conv3d(name, N, T, H, W, Cin, Cout, kt, kh, kw, kpair, reps):
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(0)
    fl = 2 * N * T * H * W * Cin * Cout * kt * kh * kw
    out = {'metric': name, 'unit': 'TF/s (int8: TOP/s)'}

    def conv(pet):
        return lambda a, b: jax.lax.conv_general_dilated(
            a, b, (1, 1, 1), 'SAME',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
            preferred_element_type=pet)

    wb = jax.jit(lambda k: jax.random.normal(
        k, (kt, kh, kw, Cin, Cout), jnp.bfloat16))(key)
    out['bf16'] = round(_bench(
        lambda: jax.jit(lambda k: jax.random.normal(
            k, (N, T, H, W, Cin), jnp.bfloat16))(key),
        wb, conv(None), fl, kpair, reps) / 1e12, 2)
    w8 = jax.jit(lambda k: jax.random.randint(
        k, (kt, kh, kw, Cin, Cout), -127, 127, jnp.int8))(key)
    out['int8'] = round(_bench(
        lambda: jax.jit(lambda k: jax.random.randint(
            k, (N, T, H, W, Cin), -127, 127, jnp.int8))(key),
        w8, conv(jnp.int32), fl, kpair, reps) / 1e12, 2)
    print(json.dumps(out), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--mode', choices=['matmul', 'conv', 'conv3d', 'both',
                                      'all'],
                   default='both')
    p.add_argument('--k', type=int, nargs=2, default=(8, 136))
    p.add_argument('--reps', type=int, default=4)
    args = p.parse_args()
    if args.mode in ('matmul', 'both', 'all'):
        for name, M, K, N in MATMULS:
            bench_matmul(name, M, K, N, tuple(args.k), args.reps)
    if args.mode in ('conv', 'both', 'all'):
        for spec in CONVS:
            bench_conv(*spec, tuple(args.k), args.reps)
    if args.mode in ('conv3d', 'all'):
        for spec in CONV3DS:
            bench_conv3d(*spec, tuple(args.k), args.reps)


if __name__ == '__main__':
    main()
