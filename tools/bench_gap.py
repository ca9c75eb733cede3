#!/usr/bin/env python3
"""Attribute the flagship dense-test e2e vs piece-sum gap (~3.3 ms).

Round-2's forward partition (docs/DESIGN.md) summed isolated pieces to
24.8 ms against a 28.1 ms e2e forward and attributed the difference
loosely to "input cast/normalize, scheduling slack, MVF 5D reshapes"
without measurement. This tool times the *real* model end-to-end under
controlled variants at the exact dense-test shapes (240 folded frames,
256x256, bf16 on TPU) so the gap can be localized:

  full        e2e baseline (= bench.py, fp32 input)
  bf16in      input pre-cast to bf16 -> isolates the harness perturb+cast
  castonly    jitted perturb+cast+reduce of the input alone (upper bound
              on what 'input cast' can possibly cost)
  nomvf       mvf_freq all-zero -> isolates total MVF insertion cost
  trunc1..4   truncated real backbone (num_stages=k, MVF freq sliced,
              mean-pooled output) -> successive differences give real
              per-stage marginals to compare against the isolated pieces
  fullq       int8_static (1,1,0,0) recipe e2e (in-situ quant cost)
  fullq_stem  same + quant_stem (the 2.04 ms s2d stem in int8)
  trunc1q/2q  truncated backbone fully quantized -> in-situ per-stage
              int8 marginals vs the bf16 trunc series

Chained-fori_loop timing methodology as bench.py (relay-safe).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

K1, K2, REPS = 1, 9, 3
MVF_FREQ = (0, 0, 1, 1)


def timeit(fn, x, k_pair, reps=REPS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(imgs, k):
        def body(i, acc):
            y = fn(imgs + i.astype(imgs.dtype) * 1e-6)
            return acc + jnp.mean(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    def best(k):
        k = jnp.asarray(k, jnp.int32)
        float(run(x, k))
        b = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, k))
            b = min(b, time.perf_counter() - t0)
        return b

    k1, k2 = k_pair
    return (best(k2) - best(k1)) / (k2 - k1)


def build_full(dtype, mvf=True, quant=None, quant_stages=(1, 1, 0, 0),
               quant_stem=False, quant_carry=False):
    from mvfnet_tpu.models import build_recognizer
    return build_recognizer(
        dict(type='Recognizer2D',
             backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                           norm_eval=False, quant=quant,
                           quant_stages=quant_stages, quant_stem=quant_stem,
                           quant_carry=quant_carry,
                           norm_cfg=dict(type='BN', requires_grad=True)),
             cls_head=dict(type='TSNClsHead', spatial_size=-1,
                           spatial_type='avg', dropout_ratio=0.5,
                           in_channels=2048, init_std=0.01, num_classes=400),
             module_cfg=dict(type='MVF', n_segment=8, alpha=0.125,
                             mvf_freq=MVF_FREQ if mvf else (0, 0, 0, 0),
                             mode='THW'),
             fcn_testing=True, dtype=dtype),
        test_cfg=dict(average_clips='prob'))


def build_trunc(dtype, num_stages, quant=None, quant_carry=False):
    """Truncated real backbone exactly as the full model configures it."""
    from mvfnet_tpu.models.recognizers.recognizer2d import \
        _prepare_backbone_cfg
    from mvfnet_tpu.models import build_backbone
    bb = dict(type='ResNet', depth=50, num_stages=num_stages,
              out_indices=(num_stages - 1,), norm_eval=False,
              quant=quant, quant_stages=(1, 1, 1, 1)[:num_stages],
              quant_carry=quant_carry,
              strides=(1, 2, 2, 2)[:num_stages],
              dilations=(1, 1, 1, 1)[:num_stages],
              norm_cfg=dict(type='BN', requires_grad=True))
    cfg = _prepare_backbone_cfg(
        bb, dict(type='MVF', n_segment=8, alpha=0.125,
                 mvf_freq=MVF_FREQ[:num_stages], mode='THW'), 'RGB', None)
    cfg['dtype'] = dtype
    return build_backbone(cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--variants', nargs='+',
                    default=['full', 'bf16in', 'castonly', 'nomvf',
                             'trunc1', 'trunc2', 'trunc3', 'trunc4'])
    ap.add_argument('--k', type=int, nargs=2, default=(K1, K2))
    ap.add_argument('--quant-carry', action='store_true',
                    help='quant variants run the integer-carry pipeline '
                         'instead of the literal (default) form — A/B '
                         'apparatus, measured slower e2e (DESIGN.md '
                         '"Int8 integer carry: refuted")')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    k_pair = tuple(args.k) if on_tpu else (1, 2)
    size = 256 if on_tpu else 64
    views, clip_len = 30, 8
    shape = (1, views * clip_len, size, size, 3)
    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.randn(*shape).astype(np.float32))

    results = {}
    for name in args.variants:
        if name == 'castonly':
            t = timeit(lambda v: v.astype(dtype), x32, k_pair)
        elif name in ('full', 'bf16in', 'nomvf', 'fullq', 'fullq_stem'):
            q = 'int8_static' if name.startswith('fullq') else None
            model = build_full(dtype, mvf=(name != 'nomvf'), quant=q,
                               quant_stem=name.endswith('stem'),
                               quant_carry=args.quant_carry)
            xin = x32.astype(dtype) if name == 'bf16in' else x32
            v = model.init(jax.random.PRNGKey(0), xin, None,
                           return_loss=False, train=False)
            if q:  # mark static scales calibrated (calib input = bench's)
                _, mut = model.apply(v, xin, None, return_loss=False,
                                     mutable=['quant_stats'])
                v = dict(v, quant_stats=mut['quant_stats'])
            t = timeit(lambda im, v=v, m=model: m.apply(
                v, im, None, return_loss=False), xin, k_pair)
        elif name.startswith('trunc'):
            quant = 'int8_static' if name.endswith('q') else None
            ns = int(name[5])
            bb = build_trunc(dtype, ns, quant=quant,
                             quant_carry=args.quant_carry)
            xf = x32.reshape((-1,) + x32.shape[2:])
            v = bb.init(jax.random.PRNGKey(0), xf, train=False)
            if quant:
                _, mut = bb.apply(v, xf, train=False,
                                  mutable=['quant_stats'])
                v = dict(v, quant_stats=mut['quant_stats'])
            t = timeit(lambda im, v=v, m=bb: m.apply(v, im, train=False),
                       xf, k_pair)
        else:
            raise SystemExit(f'unknown variant {name}')
        results[name] = round(t * 1e3, 3)
        print(json.dumps({'variant': name, 'ms': results[name]}),
              flush=True)

    if {'trunc1', 'trunc2', 'trunc3', 'trunc4'} <= results.keys():
        m = {f'stage{i}_marginal_ms':
             round(results[f'trunc{i}'] - results[f'trunc{i-1}'], 3)
             for i in range(2, 5)}
        print(json.dumps(m), flush=True)
    if {'full', 'bf16in'} <= results.keys():
        print(json.dumps({'cast_cost_ms':
                          round(results['full'] - results['bf16in'], 3)}),
              flush=True)
    if {'full', 'nomvf'} <= results.keys():
        print(json.dumps({'mvf_cost_ms':
                          round(results['full'] - results['nomvf'], 3)}),
              flush=True)


if __name__ == '__main__':
    main()
