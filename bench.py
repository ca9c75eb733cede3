#!/usr/bin/env python3
"""Headline benchmark: MVFNet-R50 8x8 dense-test inference throughput.

Measures per-chip clips/sec for the reference's headline inference config
(ThreeCrop(256) x 10 clips x 8 frames = 30 clip-views per video,
``/root/reference/configs/MVFNet/K400/mvf_kinetics400_2d_rgb_r50_dense.py:101-119``),
bf16 compute, fcn testing, on one device.

Timing methodology: this host reaches its TPU through an async relay whose
per-fetch overhead (~1s) dwarfs single-forward latency and whose
``block_until_ready`` is unreliable. We therefore run K model invocations
inside one jitted ``lax.fori_loop`` (input perturbed per iteration so the
loop body cannot be hoisted), fetch one scalar, and difference two K values
to cancel the fixed overhead:  t_video = (T(K2) - T(K1)) / (K2 - K1).

Baseline: the reference publishes no clips/sec. BASELINE.json targets >=3x
the per-chip clips/sec of the V100 reference, estimated at 170 clips/s
(65.8 GFLOPs/clip at ~11 TFLOP/s effective fp32 eval).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import time

V100_BASELINE_CLIPS_PER_SEC = 170.0
K1, K2 = 1, 9
REPS = 3


def measure(quant, quant_stages, quant_carry=False, depth=50, clip_len=8):
    """Return dense-test clips/sec for one precision variant.

    ``depth``/``clip_len`` generalize the headline R50 8x8 geometry to the
    reference's full model-zoo grid (R50/R101 x 4x16/8x8/16x4,
    /root/reference/README.md:52-57) — used by tools/bench_zoo.py; the
    driver line stays pinned to (50, 8)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvfnet_tpu.models import build_recognizer

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    num_clips, crops, size = 10, 3, 256
    views = num_clips * crops  # 30 clip-views per video

    model = build_recognizer(
        dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=depth, out_indices=(3,),
                          norm_eval=False, quant=quant,
                          quant_stages=tuple(quant_stages),
                          quant_carry=quant_carry,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=2048, init_std=0.01, num_classes=400),
            module_cfg=dict(type='MVF', n_segment=clip_len, alpha=0.125,
                            mvf_freq=(0, 0, 1, 1), mode='THW'),
            fcn_testing=True,
            dtype=dtype,
        ),
        test_cfg=dict(average_clips='prob'))

    shape = (1, views * clip_len, size, size, 3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, None,
                           return_loss=False, train=False)

    @jax.jit
    def run(v, imgs, k):
        # dynamic trip count -> ONE compile serves every k
        def body(i, acc):
            # per-iteration input perturbation prevents loop hoisting
            s = model.apply(v, imgs + i.astype(imgs.dtype) * 1e-6,
                            None, return_loss=False)
            return acc + jnp.mean(s)
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    def times(k):
        k = jnp.asarray(k, jnp.int32)
        float(run(variables, x, k))  # compile (first call) + warm
        out = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(run(variables, x, k))  # scalar fetch = true sync point
            out.append(time.perf_counter() - t0)
        return out

    k1, k2 = (K1, K2) if on_tpu else (1, 2)  # CPU smoke mode
    t1s, t2s = times(k1), times(k2)
    # headline estimator: best-of-reps differencing (unchanged across
    # rounds for comparability); per-rep pairing exposes the spread
    # (round-4 verdict: single numbers inside +-9% relay noise are not a
    # regression signal — publish reps + spread alongside)
    best = views / max((min(t2s) - min(t1s)) / (k2 - k1), 1e-9)
    reps = [views / max((b - a) / (k2 - k1), 1e-9)
            for a, b in zip(t1s, t2s)]
    return best, reps


def measure_train(batch=12, clip_len=8, size=224, depth=50):
    """R50 8x8 train-step clips/sec (the recipe's 12 videos/chip at 224^2),
    same chained-timing methodology as ``measure``; mirrors
    tools/bench_train.py so train throughput sits under driver regression
    tracking next to the dense-test headline (round-3 verdict item 6).
    ``depth``/``clip_len`` generalize to the zoo grid (tools/bench_zoo.py)."""
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
        backbone=dict(type='ResNet', depth=depth, out_indices=(3,),
                      norm_eval=False,
                      norm_cfg=dict(type='BN', requires_grad=True)),
        cls_head=dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                      dropout_ratio=0.5, in_channels=2048, init_std=0.01,
                      num_classes=400),
        module_cfg=dict(type='MVF', n_segment=clip_len, alpha=0.125,
                        mvf_freq=(0, 0, 1, 1), mode='THW'),
        dtype=dtype), test_cfg=dict(average_clips='prob'))

    b, t, s = (batch, clip_len, size) if on_tpu else (2, clip_len, 64)
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

    def times(k):
        @jax.jit
        def run(state, imgs, labels):
            def body(i, st):
                st, _ = step(st, imgs + i.astype(imgs.dtype) * 1e-6,
                             labels, key)
                return st
            st = jax.lax.fori_loop(0, k, body, state)
            return st.params['head_mod']['fc']['bias'][0]
        float(run(state0, imgs, labels))  # compile + warm
        out = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(run(state0, imgs, labels))
            out.append(time.perf_counter() - t0)
        return out

    k1, k2 = (1, 5) if on_tpu else (1, 2)
    t1s, t2s = times(k1), times(k2)
    best = b / max((min(t2s) - min(t1s)) / (k2 - k1), 1e-9)
    reps = [b / max((y - x) / (k2 - k1), 1e-9) for x, y in zip(t1s, t2s)]
    return best, reps, b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quant', choices=['int8', 'int8_static'], default=None,
                    help='report ONLY this quant variant as the headline '
                         '(DESIGN.md "Int8 dense-test"); default: bf16 '
                         'headline + int8_static side report')
    ap.add_argument('--quant-stages', type=int, nargs=4, default=(1, 1, 0, 0),
                    help='per-stage 0/1 mask of which res-stages quantize '
                         '(default = the measured-best (1,1,0,0) recipe)')
    ap.add_argument('--skip-quant', action='store_true',
                    help='bf16 headline only; skip the int8_static side run')
    ap.add_argument('--skip-train', action='store_true',
                    help='skip the train-throughput side run')
    ap.add_argument('--quant-carry', action='store_true',
                    help='run the int8 variant with the integer-carry '
                         'pipeline instead of the literal (default) form '
                         '(A/B apparatus; measured ~3.5%% slower e2e — '
                         'DESIGN.md "Int8 integer carry: refuted")')
    args = ap.parse_args()

    def stats(reps):
        """Per-rep values + median/spread so a cross-round delta can be
        judged against same-session noise (round-4 verdict item 5)."""
        med = sorted(reps)[len(reps) // 2]
        spread = (max(reps) - min(reps)) / med * 100 if med else 0.0
        return round(med, 2), round(spread, 1), [round(r, 2) for r in reps]

    if args.quant:  # explicit single-variant mode
        clips_per_sec, reps = measure(args.quant, args.quant_stages,
                                      quant_carry=args.quant_carry)
        med, spread, rep_vals = stats(reps)
        print(json.dumps({
            'metric': 'r50_8x8_dense_test_clips_per_sec_per_chip',
            'value': round(clips_per_sec, 2),
            'unit': 'clips/sec/chip',
            'vs_baseline':
                round(clips_per_sec / V100_BASELINE_CLIPS_PER_SEC, 3),
            'quant': args.quant,
            'reps': rep_vals, 'median': med, 'spread_pct': spread,
        }))
        return

    # Default driver line: bf16 exact-math headline, plus the measured
    # int8_static (1,1,0,0) recipe as a side field (VERDICT r2 item 2b —
    # bf16 stays the accuracy-default until real-data validation; drift
    # bound: tests/test_quant_int8.py::test_golden_weights_margin_drift).
    clips_per_sec, dense_reps = measure(None, (1, 1, 1, 1))
    med, spread, rep_vals = stats(dense_reps)
    out = {
        'metric': 'r50_8x8_dense_test_clips_per_sec_per_chip',
        'value': round(clips_per_sec, 2),
        'unit': 'clips/sec/chip',
        'vs_baseline': round(clips_per_sec / V100_BASELINE_CLIPS_PER_SEC, 3),
        'reps': rep_vals, 'median': med, 'spread_pct': spread,
    }
    if not args.skip_quant:
        try:
            q, q_reps = measure('int8_static', args.quant_stages)
            qmed, qspread, qvals = stats(q_reps)
            out['int8_static_value'] = round(q, 2)
            out['int8_static_stages'] = list(args.quant_stages)
            out['int8_static_vs_baseline'] = round(
                q / V100_BASELINE_CLIPS_PER_SEC, 3)
            out['int8_static_reps'] = qvals
            out['int8_static_spread_pct'] = qspread
        except Exception as e:  # never lose the bf16 line to a quant bug
            out['int8_static_error'] = f'{type(e).__name__}: {e}'[:120]
    if not args.skip_train:
        try:
            tps, t_reps, tb = measure_train()
            tmed, tspread, tvals = stats(t_reps)
            out['train_value'] = round(tps, 2)
            out['train_unit'] = 'clips/sec/chip'
            out['train_batch'] = tb
            out['train_reps'] = tvals
            out['train_spread_pct'] = tspread
            # canonical cross-round regression signal: the same-session
            # train/dense ratio — relay/session noise is common-mode and
            # cancels (docs/DESIGN.md "Driver bench noise tracking")
            out['train_dense_ratio'] = round(tps / clips_per_sec, 4)
        except Exception as e:  # never lose the headline to a train-bench bug
            out['train_error'] = f'{type(e).__name__}: {e}'[:120]
    print(json.dumps(out))


if __name__ == '__main__':
    main()
