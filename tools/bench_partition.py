#!/usr/bin/env python3
"""Forward-pass wall-time partition of the flagship R50-MVF dense test.

Times each structural piece of the eval graph (stem, per-stage block0 and
mid blocks, MVF mid blocks, head) as standalone jitted XLA programs at the
exact dense-test shapes (240 folded frames, 256x256 crops, bf16), using the
chained-fori_loop methodology from bench.py. The sum approximates the full
forward and tells us where optimization effort pays.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

K1, K2, REPS = 2, 10, 3


def timeit(fn, *args):
    @jax.jit
    def run(x, rest, k):
        def body(i, acc):
            y = fn(x + i.astype(x.dtype) * 1e-6, *rest)
            return acc + jnp.mean(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    x, rest = args[0], args[1:]

    def best(k):
        k = jnp.asarray(k, jnp.int32)
        float(run(x, rest, k))
        b = float('inf')
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(run(x, rest, k))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(K2) - best(K1)) / (K2 - K1)


def conv(x, w, stride=1, pad=None):
    kh = w.shape[0]
    pad = pad if pad is not None else kh // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def mk(*shape, dtype=jnp.bfloat16, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape) * 0.05, dtype)


def bottleneck_mid(cin, cm):
    w1, w2, w3 = mk(1, 1, cin, cm), mk(3, 3, cm, cm), mk(1, 1, cm, cin)

    def f(x):
        h = jnp.maximum(conv(x, w1), 0)
        h = jnp.maximum(conv(h, w2), 0)
        return jnp.maximum(conv(h, w3) + x, 0)
    return f


def bottleneck_b0(cin, cm, cout, stride):
    w1, w2, w3 = mk(1, 1, cin, cm), mk(3, 3, cm, cm), mk(1, 1, cm, cout)
    wd = mk(1, 1, cin, cout)

    def f(x):
        h = jnp.maximum(conv(x, w1), 0)
        h = jnp.maximum(conv(h, w2, stride=stride), 0)
        ident = conv(x, wd, stride=stride)
        return jnp.maximum(conv(h, w3) + ident, 0)
    return f


def mvf_mid(cin, cm, alpha=0.125, t=8):
    cs = int(cin * alpha)
    w1, w2, w3 = mk(1, 1, cin, cm), mk(3, 3, cm, cm), mk(1, 1, cm, cin)
    kt = mk(3, cs, seed=1)  # temporal taps
    kh = mk(3, cs, seed=2)
    kw = mk(3, cs, seed=3)

    def f(x):
        n, hh, ww, c = x.shape
        a = x[..., :cs]
        a5 = a.reshape(n // t, t, hh, ww, cs)
        y = (a5 * kt[1] + jnp.pad(a5, ((0, 0), (1, 0), (0, 0), (0, 0),
                                       (0, 0)))[:, :-1] * kt[0]
             + jnp.pad(a5, ((0, 0), (0, 1), (0, 0), (0, 0),
                            (0, 0)))[:, 1:] * kt[2])
        yh = (a5 * kh[1] + jnp.pad(a5, ((0, 0), (0, 0), (1, 0), (0, 0),
                                        (0, 0)))[:, :, :-1] * kh[0]
              + jnp.pad(a5, ((0, 0), (0, 0), (0, 1), (0, 0),
                             (0, 0)))[:, :, 1:] * kh[2])
        yw = (a5 * kw[1] + jnp.pad(a5, ((0, 0), (0, 0), (0, 0), (1, 0),
                                        (0, 0)))[:, :, :, :-1] * kw[0]
              + jnp.pad(a5, ((0, 0), (0, 0), (0, 0), (0, 1),
                             (0, 0)))[:, :, :, 1:] * kw[2])
        a = jax.nn.hard_swish(y + yh + yw).reshape(n, hh, ww, cs)
        h = conv(a, w1[:, :, :cs]) + conv(x[..., cs:], w1[:, :, cs:])
        h = jnp.maximum(h, 0)
        h = jnp.maximum(conv(h, w2), 0)
        return jnp.maximum(conv(h, w3) + x, 0)
    return f


def stem(x, w):
    h = jnp.maximum(conv(x, w, stride=2), 0)
    return jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def main():
    print('backend:', jax.default_backend())
    n = 240
    rows = []

    def add(name, count, t):
        rows.append((name, count, t * 1e3))
        print(f'{name:36s} x{count}  {t*1e3:7.3f} ms each  '
              f'{count*t*1e3:7.3f} ms total')

    x0 = mk(n, 256, 256, 3)
    w_stem = mk(7, 7, 3, 64)
    add('stem conv+maxpool 256->64', 1, timeit(lambda x: stem(x, w_stem), x0))

    x1i = mk(n, 64, 64, 64)
    add('layer1 b0 (64ch->256, s1)', 1,
        timeit(bottleneck_b0(64, 64, 256, 1), x1i))
    x1 = mk(n, 64, 64, 256)
    add('layer1 mid (256/64)', 2, timeit(bottleneck_mid(256, 64), x1))
    add('layer2 b0 (256->512, s2)', 1,
        timeit(bottleneck_b0(256, 128, 512, 2), x1))
    x2 = mk(n, 32, 32, 512)
    add('layer2 mid (512/128)', 3, timeit(bottleneck_mid(512, 128), x2))
    add('layer3 b0 (512->1024, s2)', 1,
        timeit(bottleneck_b0(512, 256, 1024, 2), x2))
    x3 = mk(n, 16, 16, 1024)
    add('layer3 mvf-mid (1024/256)', 5, timeit(mvf_mid(1024, 256), x3))
    add('layer4 b0 (1024->2048, s2)', 1,
        timeit(bottleneck_b0(1024, 512, 2048, 2), x3))
    x4 = mk(n, 8, 8, 2048)
    add('layer4 mvf-mid (2048/512)', 2, timeit(mvf_mid(2048, 512), x4))

    wfc = mk(2048, 400)

    def head(x):
        return jnp.mean(x, axis=(1, 2)) @ wfc
    add('head (GAP+FC)', 1, timeit(head, x4))

    total = sum(c * t for _, c, t in rows)
    print(f'{"SUM":36s}              {total:7.3f} ms '
          f'(~{30 / (total / 1e3):.0f} clips/s if forward-only)')


if __name__ == '__main__':
    main()
