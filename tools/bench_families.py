#!/usr/bin/env python3
"""Model-family inference benchmark: per-chip clips/sec for the 3-D
recognizers (I3D, SlowFast, X3D) at their shipped-config test shapes
(one ThreeCrop group of 256^2 views), bf16 on TPU.

Same relay-safe chained-timing methodology as bench.py: K invocations in
one jitted ``lax.fori_loop`` with a loop-variant input, one scalar fetch,
difference two K values. Prints one JSON line per family."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

FAMILIES = {
    'i3d_r50_32x2': ('configs/i3d/i3d_r50_32x2_k400.py', 32),
    'slowfast_r50_64x1': ('configs/slowfast/slowfast_r50_k400.py', 64),
    'x3d_16x5': ('configs/x3d/x3d_k400.py', 16),
}


def bench_family(name, cfg_path, clip_len, k_pair, reps,
                 size=256, views=3, view_chunk=None, fast_pack=0,
                 quant=None, quant_stages=None, quant_ops=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvfnet_tpu import Config
    from mvfnet_tpu.models import build_recognizer

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = Config.fromfile(cfg_path)
    model_cfg = dict(cfg.model, dtype=dtype)
    if fast_pack:
        model_cfg['backbone'] = dict(model_cfg['backbone'],
                                     fast_pack=fast_pack)
    if quant:
        model_cfg['backbone'] = dict(model_cfg['backbone'], quant=quant)
        if quant_stages is not None:
            model_cfg['backbone']['quant_stages'] = tuple(quant_stages)
        if quant_ops is not None:
            model_cfg['backbone']['quant_ops'] = tuple(quant_ops)
    test_cfg = dict(average_clips='prob')
    if view_chunk:
        test_cfg['view_chunk'] = view_chunk
    model = build_recognizer(model_cfg, test_cfg=test_cfg)

    shape = (1, views, clip_len, size, size, 3)  # one ThreeCrop group
    # generate on device: shipping a multi-GB host array through a dev
    # box's network relay would dominate the benchmark setup time
    x = jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32))(
        jax.random.PRNGKey(0))
    # init at ONE view: flax init executes un-jitted (op-by-op through
    # the device relay), which at 60+ views dominated wall-clock and
    # blew past the benchmark timeout; params/stats don't depend on the
    # folded view count
    x_init = jax.jit(lambda k: jax.random.normal(
        k, (1, 1) + shape[2:], jnp.float32))(jax.random.PRNGKey(1))
    variables = model.init(jax.random.PRNGKey(0), x_init, None,
                           return_loss=False, train=False)
    if quant == 'int8_static':
        # calibrate static activation scales on the bench input
        _, mut = model.apply(variables, x, None, return_loss=False,
                             mutable=['quant_stats'])
        variables = dict(variables, quant_stats=mut['quant_stats'])

    @jax.jit
    def run(v, imgs, k):
        def body(i, acc):
            s = model.apply(v, imgs + i.astype(imgs.dtype) * 1e-6,
                            None, return_loss=False)
            return acc + jnp.mean(s)
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    def best_time(k):
        k = jnp.asarray(k, jnp.int32)
        float(run(variables, x, k))
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(variables, x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = k_pair if on_tpu else (1, 2)
    t1, t2 = best_time(k1), best_time(k2)
    per_call = max((t2 - t1) / (k2 - k1), 1e-9)
    print(json.dumps({
        'metric': f'{name}_test_clips_per_sec_per_chip',
        'value': round(views / per_call, 2),
        'unit': 'clips/sec/chip',
        'clip_len': clip_len,
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--families', nargs='+', default=sorted(FAMILIES),
                   choices=sorted(FAMILIES))
    p.add_argument('--k', type=int, nargs=2, default=(1, 5))
    p.add_argument('--reps', type=int, default=2)
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--clip-len', type=int, default=None,
                   help='override clip length (CPU smoke)')
    p.add_argument('--views', type=int, default=3,
                   help='views per call (3 = one ThreeCrop group; larger '
                        'values batch several groups per device call)')
    p.add_argument('--view-chunk', type=int, default=None,
                   help='process the view batch in unrolled chunks of this '
                        'many clips inside the compiled program')
    p.add_argument('--fast-pack', type=int, default=0,
                   help='SlowFast fast-pathway time-to-channel pack factor '
                        '(backbone.fast_pack; ignored by other families)')
    p.add_argument('--quant', choices=['int8', 'int8_static'], default=None,
                   help='eval-only int8 conv path (per-layer-TYPE masked: '
                        'I3D spatial-only, X3D pointwise-only)')
    p.add_argument('--quant-stages', type=int, nargs='+', default=None,
                   help='per-stage 0/1 quant mask (backbone default if unset)')
    p.add_argument('--quant-ops', nargs='+', default=None,
                   choices=['spatial', 'temporal', 'pointwise'],
                   help='conv TYPES to quantize (backbone default if unset)')
    args = p.parse_args()
    for name in args.families:
        cfg_path, clip_len = FAMILIES[name]
        bench_family(name, cfg_path, args.clip_len or clip_len,
                     tuple(args.k), args.reps, size=args.size,
                     views=args.views, view_chunk=args.view_chunk,
                     fast_pack=args.fast_pack if 'slowfast' in name else 0,
                     quant=args.quant, quant_stages=args.quant_stages,
                     quant_ops=args.quant_ops)


if __name__ == '__main__':
    main()
