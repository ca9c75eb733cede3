#!/usr/bin/env python3
"""Training-throughput benchmark: R50 8x8 train step, per-chip clips/sec.

Same relay-safe chained-timing methodology as bench.py (K train steps in one
jitted fori_loop carrying the TrainState; one scalar fetch; difference two
K values). Batch = the reference recipe's 12 videos/chip at 224^2, bf16
compute."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=12)
    p.add_argument('--clip-len', type=int, default=8)
    p.add_argument('--size', type=int, default=224)
    p.add_argument('--k', type=int, nargs=2, default=(1, 5))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvfnet_tpu.engine.optim import build_lr_schedule, build_optimizer
    from mvfnet_tpu.engine.train_step import TrainState, make_train_step
    from mvfnet_tpu.models import build_recognizer

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_recognizer(dict(
        type='Recognizer2D',
        backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                      norm_eval=False,
                      norm_cfg=dict(type='BN', requires_grad=True)),
        cls_head=dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                      dropout_ratio=0.5, in_channels=2048, init_std=0.01,
                      num_classes=400),
        module_cfg=dict(type='MVF', n_segment=args.clip_len, alpha=0.125,
                        mvf_freq=(0, 0, 1, 1), mode='THW'),
        dtype=dtype), test_cfg=dict(average_clips='prob'))

    b, t, s = args.batch, args.clip_len, args.size
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(b, t, s, s, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 400, size=b).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), imgs, labels,
                           return_loss=True, train=False)
    sched = build_lr_schedule(dict(policy='step', step=[90, 130],
                                   warmup='linear', warmup_iters=100,
                                   warmup_ratio=0.01),
                              0.015, 1000, 150)
    tx = build_optimizer(variables['params'],
                         dict(type='SGD', lr=0.015, momentum=0.9,
                              weight_decay=1e-4, nesterov=True),
                         sched, grad_clip=dict(max_norm=40, norm_type=2))
    state0 = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mesh=None,
                           input_dtype=dtype, donate=False)
    key = jax.random.PRNGKey(1)

    def best_time(k):
        @jax.jit
        def run(state, imgs, labels):
            def body(i, st):
                st, metrics = step(st, imgs + i.astype(imgs.dtype) * 1e-6,
                                   labels, key)
                return st
            st = jax.lax.fori_loop(0, k, body, state)
            return st.params['head_mod']['fc']['bias'][0]
        float(run(state0, imgs, labels))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(state0, imgs, labels))
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = args.k if on_tpu else (1, 2)
    t1, t2 = best_time(k1), best_time(k2)
    per_step = max((t2 - t1) / (k2 - k1), 1e-9)
    print(json.dumps({
        'metric': 'r50_8x8_train_clips_per_sec_per_chip',
        'value': round(b / per_step, 2),
        'unit': 'clips/sec/chip',
        'step_ms': round(per_step * 1e3, 2),
        'batch': b,
    }))


if __name__ == '__main__':
    main()
