#!/usr/bin/env python3
"""Train-step wall-time partition of the flagship R50-MVF recipe.

Isolates where the 40.9 ms train step (batch 12x8 frames @224, bf16) goes:
- per-stage forward+backward cost, by differencing truncated backbones
  (num_stages = 1..4, grad of mean(features) w.r.t. params);
- BatchNorm batch-statistics cost, by comparing norm_eval=True (running
  stats, no reductions) against train-mode BN at equal graphs;
- forward-only vs value_and_grad, same loss.

Uses the relay-safe chained-timing methodology from bench.py.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

K1, K2, REPS = 1, 5, 2


def timed(make_fn, x):
    fn = jax.jit(make_fn)

    def best(k):
        k = jnp.asarray(k, jnp.int32)
        float(fn(x, k))
        b = float('inf')
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn(x, k))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(K2) - best(K1)) / (K2 - K1)


def backbone_grad_time(num_stages, frames, size, norm_eval=False,
                       with_mvf=True, backward=True):
    from mvfnet_tpu.models import build_backbone
    cfg = dict(type='ResNet', depth=50, num_stages=num_stages,
               out_indices=(num_stages - 1,), norm_eval=norm_eval,
               norm_cfg=dict(type='BN', requires_grad=True),
               strides=(1, 2, 2, 2)[:num_stages],
               dilations=(1, 1, 1, 1)[:num_stages],
               dtype=jnp.bfloat16)
    if with_mvf:
        cfg['temporal_cfg'] = dict(type='MVF', n_segment=8, alpha=0.125,
                                   mode='THW')
        cfg['temporal_freq'] = (0, 0, 1, 1)[:num_stages]
    bb = build_backbone(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(frames, size, size, 3).astype(np.float32))
    variables = bb.init(jax.random.PRNGKey(0), x, train=True)
    params = variables['params']
    bs = variables.get('batch_stats', {})

    def loss(p, v):
        out, _ = bb.apply({'params': p, 'batch_stats': bs}, v, train=True,
                          mutable=['batch_stats'])
        return jnp.mean(out.astype(jnp.float32))

    if backward:
        def step(v, k):
            def body(i, acc):
                l, g = jax.value_and_grad(loss)(
                    params, v + i.astype(v.dtype) * 1e-6)
                return acc + l + jnp.mean(g['conv1']['kernel'])
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
    else:
        def step(v, k):
            def body(i, acc):
                return acc + loss(params, v + i.astype(v.dtype) * 1e-6)
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
    return timed(step, x)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--frames', type=int, default=96)  # 12 videos x 8
    p.add_argument('--size', type=int, default=224)
    p.add_argument('--stages', type=int, nargs='+', default=[1, 2, 3, 4],
                   help='truncation depths to time (fwd+bwd)')
    p.add_argument('--fwd-only', action='store_true')
    p.add_argument('--norm-eval', action='store_true')
    args = p.parse_args()
    print('backend:', jax.default_backend(), flush=True)

    for n in args.stages:
        t = backbone_grad_time(n, args.frames, args.size,
                               norm_eval=args.norm_eval,
                               backward=not args.fwd_only)
        tag = ('fwd' if args.fwd_only else 'fwd+bwd') + \
            (' norm_eval' if args.norm_eval else '')
        print(f'stem..layer{n} {tag}: {t*1e3:8.3f} ms', flush=True)


if __name__ == '__main__':
    main()
