#!/usr/bin/env python3
"""Training-throughput benchmark for the 3-D recognizers (I3D, SlowFast,
X3D) at their shipped-config recipe shapes (videos_per_gpu clips of
clip_len frames at 224^2), bf16 compute.

Same relay-safe chained-timing methodology as bench_train.py: K full train
steps (fwd+bwd+clip+SGD) in one jitted ``fori_loop`` carrying the
TrainState; one scalar fetch; difference two K values. Prints one JSON
line per family."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

FAMILIES = {
    'i3d_r50_32x2': 'configs/i3d/i3d_r50_32x2_k400.py',
    'slowfast_r50_64x1': 'configs/slowfast/slowfast_r50_k400.py',
    'x3d_16x5': 'configs/x3d/x3d_k400.py',
}


def bench_family(name, cfg_path, k_pair, reps, batch=None, size=224,
                 fast_pack=0, stem_s2d=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvfnet_tpu import Config
    from mvfnet_tpu.engine.optim import build_lr_schedule, build_optimizer
    from mvfnet_tpu.engine.train_step import TrainState, make_train_step
    from mvfnet_tpu.models import build_recognizer

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = Config.fromfile(cfg_path)
    if fast_pack:
        cfg.model['backbone'] = dict(cfg.model['backbone'],
                                     fast_pack=fast_pack)
    if stem_s2d is not None:
        cfg.model['backbone'] = dict(cfg.model['backbone'],
                                     stem_s2d=stem_s2d)
    model = build_recognizer(dict(cfg.model, dtype=dtype),
                             train_cfg=dict(cfg.get('train_cfg') or {}),
                             test_cfg=dict(cfg.test_cfg))
    # recipe shapes from the config's own train pipeline
    train_pipe = cfg.data['train']['pipeline']
    sample = next(p for p in train_pipe if p['type'] == 'SampleFrames')
    clip_len = sample['clip_len']
    b = batch or cfg.data.get('videos_per_gpu', 8)
    num_classes = cfg.model['cls_head']['num_classes']

    rng = np.random.RandomState(0)
    imgs = jax.jit(lambda k: jax.random.normal(
        k, (b, 1, clip_len, size, size, 3), jnp.float32))(
            jax.random.PRNGKey(0))
    labels = jnp.asarray(rng.randint(0, num_classes, size=b), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), imgs[:1], labels[:1],
                           return_loss=True, train=False)
    sched = build_lr_schedule(dict(policy='step', step=[90]), 0.01, 1000,
                              150)
    tx = build_optimizer(variables['params'], dict(cfg.optimizer), sched,
                         grad_clip=(cfg.get('optimizer_config')
                                    or {}).get('grad_clip'))
    state0 = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mesh=None, input_dtype=dtype,
                           donate=False)
    key = jax.random.PRNGKey(1)

    def best_time(k):
        kk = jnp.asarray(k, jnp.int32)

        @jax.jit
        def run(state, imgs, labels, kk):
            def body(i, st):
                st, _ = step(st, imgs + i.astype(imgs.dtype) * 1e-6,
                             labels, key)
                return st
            st = jax.lax.fori_loop(0, kk, body, state)
            leaf = jax.tree_util.tree_leaves(st.params)[0]
            return jnp.sum(leaf.astype(jnp.float32))
        float(run(state0, imgs, labels, kk))
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(state0, imgs, labels, kk))
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = k_pair if on_tpu else (1, 2)
    t1, t2 = best_time(k1), best_time(k2)
    per_step = max((t2 - t1) / (k2 - k1), 1e-9)
    print(json.dumps({
        'metric': f'{name}_train_clips_per_sec_per_chip',
        'value': round(b / per_step, 2),
        'unit': 'clips/sec/chip',
        'step_ms': round(per_step * 1e3, 2),
        'batch': b,
        'clip_len': clip_len,
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--families', nargs='+', default=sorted(FAMILIES),
                   choices=sorted(FAMILIES))
    p.add_argument('--k', type=int, nargs=2, default=(1, 5))
    p.add_argument('--reps', type=int, default=2)
    p.add_argument('--batch', type=int, default=None,
                   help='override videos_per_gpu')
    p.add_argument('--size', type=int, default=224)
    p.add_argument('--fast-pack', type=int, default=0,
                   help='SlowFast fast-pathway T->C pack factor '
                        '(ignored by other families)')
    p.add_argument('--stem-s2d', default=None,
                   choices=['off', 'on', 'train'],
                   help="override backbone.stem_s2d (I3D/SlowFast): 'off' "
                        "reproduces the plain-stem baseline, 'train'/'on' "
                        "the s2d forms (DESIGN.md '3-D stem space-to-depth')")
    args = p.parse_args()
    s2d = {None: None, 'off': False, 'on': True,
           'train': 'train'}[args.stem_s2d]
    for name in args.families:
        bench_family(name, FAMILIES[name], tuple(args.k), args.reps,
                     batch=args.batch, size=args.size,
                     fast_pack=args.fast_pack if 'slowfast' in name else 0,
                     stem_s2d=None if 'x3d' in name else s2d)


if __name__ == '__main__':
    main()
