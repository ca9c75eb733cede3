#!/usr/bin/env python3
"""Probe: where do the 3-D families' dominant stem+stage1 costs live,
and does the flagship's space-to-depth stem trick transfer?

Round-3 partition result (tools/bench_train_partition3d.py, v5e):
I3D stem+stage1 = 39.3 of 44.1 ms fwd+bwd (89%), X3D 91.5 of 109.2
(84%).  The flagship (2-D R50) had the same shape and shipped an s2d
stem: conv 7x7 s2 Cin=3 is exactly a conv 4x4 s1 on 2x2-folded patches
(Cin=12), which quadruples the MXU contraction depth at equal math
(mvfnet_tpu/models/backbones/resnet.py).  For I3D the analogue keeps
the temporal taps: conv (5,7,7) s(2,2,2) == conv (5,4,4) s(2,1,1) on
spatially 2x2-folded input (Cin=12).

This tool times, fwd and fwd+bwd, each family's stem in both forms on
the real recipe shapes (batch 8 x 32f @224 i3d / 16 x 16f @224 x3d),
printing one JSON line per variant.  It is measurement apparatus, not a
shipping path: if s2d wins, the backbone gets a gated stem_s2d option
(the flagship pattern); if it loses, this file records the refutation
(the X3D-s2d-stages pattern).

Reference stems being reformulated:
  /root/reference/codes/models/backbones/resnet_i3d.py conv1 (5,7,7)
  /root/reference/codes/models/backbones/resnet_x3d.py conv1_s (1,3,3)
  (X3D's stem is 1x3x3 s2 Cin=3 spatial + 5x1x1 depthwise temporal —
  the s2d form folds the spatial conv to (1,2,2) s1 Cin=12.)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

K1, K2, REPS = 2, 10, 3


def timed(step, x, k_pair=(K1, K2), reps=REPS):
    import jax
    import jax.numpy as jnp
    jstep = jax.jit(step)

    def best(k):
        k = jnp.asarray(k, jnp.int32)
        float(jstep(x, k))
        b = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jstep(x, k))
            b = min(b, time.perf_counter() - t0)
        return b

    (k1, k2) = k_pair
    return (best(k2) - best(k1)) / (k2 - k1)


def fold2x2(x):
    """(N,T,H,W,C) -> (N,T,H/2,W/2,4C), torch pixel-unshuffle order."""
    import jax.numpy as jnp
    n, t, h, w, c = x.shape
    x = x.reshape(n, t, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))
    return x.reshape(n, t, h // 2, w // 2, 4 * c)


def run_variant(name, make_fn, shape, backward, dtype):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
    fn, params = make_fn(x)

    def loss(p, v):
        return jnp.mean(fn(p, v).astype(jnp.float32))

    if backward:
        def step(v, k):
            def body(i, acc):
                l, g = jax.value_and_grad(loss)(
                    params, v + i.astype(v.dtype) * 1e-6)
                return acc + l + jnp.mean(
                    jax.tree_util.tree_leaves(g)[0].astype(jnp.float32))
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
    else:
        def step(v, k):
            def body(i, acc):
                return acc + loss(params, v + i.astype(v.dtype) * 1e-6)
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    ms = timed(step, x) * 1e3
    print(json.dumps({'variant': name, 'backward': backward,
                      'ms': round(ms, 3)}), flush=True)


def i3d_variants(dtype):
    import jax
    import jax.numpy as jnp

    shape = (8, 32, 224, 224, 3)

    def plain(x):
        k = jax.random.normal(jax.random.PRNGKey(0),
                              (5, 7, 7, 3, 64), jnp.float32) * 0.05
        def fn(p, v):
            return jax.lax.conv_general_dilated(
                v, p.astype(v.dtype), (2, 2, 2),
                ((2, 2), (3, 3), (3, 3)),
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return fn, k

    def s2d(x):
        # exact reformulation: pad H,W by 3 then fold 2x2 -> taps 4
        k = jax.random.normal(jax.random.PRNGKey(0),
                              (5, 4, 4, 12, 64), jnp.float32) * 0.05
        def fn(p, v):
            v = jnp.pad(v, ((0, 0), (0, 0), (3, 5), (3, 5), (0, 0)))
            v = fold2x2(v)
            return jax.lax.conv_general_dilated(
                v, p.astype(v.dtype), (2, 1, 1),
                ((2, 2), (0, 0), (0, 0)),
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return fn, k

    return shape, [('i3d_stem_plain', plain), ('i3d_stem_s2d', s2d)]


def x3d_variants(dtype):
    import jax
    import jax.numpy as jnp

    shape = (16, 16, 224, 224, 3)

    def plain(x):
        k = jax.random.normal(jax.random.PRNGKey(0),
                              (1, 3, 3, 3, 24), jnp.float32) * 0.05
        def fn(p, v):
            return jax.lax.conv_general_dilated(
                v, p.astype(v.dtype), (1, 2, 2),
                ((0, 0), (1, 1), (1, 1)),
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return fn, k

    def s2d(x):
        k = jax.random.normal(jax.random.PRNGKey(0),
                              (1, 2, 2, 12, 24), jnp.float32) * 0.05
        def fn(p, v):
            v = jnp.pad(v, ((0, 0), (0, 0), (1, 3), (1, 3), (0, 0)))
            v = fold2x2(v)
            return jax.lax.conv_general_dilated(
                v, p.astype(v.dtype), (1, 1, 1),
                ((0, 0), (0, 0), (0, 0)),
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return fn, k

    return shape, [('x3d_stem_plain', plain), ('x3d_stem_s2d', s2d)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--families', nargs='+', default=['i3d', 'x3d'],
                   choices=['i3d', 'x3d'])
    p.add_argument('--fwd-only', action='store_true')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    dtype = (jnp.bfloat16 if jax.default_backend() == 'tpu'
             else jnp.float32)
    print('backend:', jax.default_backend(), flush=True)
    for fam in args.families:
        shape, variants = (i3d_variants(dtype) if fam == 'i3d'
                           else x3d_variants(dtype))
        for name, make in variants:
            for backward in ([False] if args.fwd_only else [False, True]):
                run_variant(name, make, shape, backward, dtype)


if __name__ == '__main__':
    main()
