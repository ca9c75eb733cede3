#!/usr/bin/env python3
"""Train-step wall-time partition for the 3-D families (I3D / SlowFast /
X3D) at their shipped-recipe shapes, bf16.

VERDICT r2 item 3: the family train numbers (I3D 182.9 / SlowFast 55.7 /
X3D 134.2 clips/s/chip, tools/bench_train_families.py) were one table row
each with no diagnosis. This tool produces the same per-stage fwd+bwd
marginals the flagship got (tools/bench_train_partition.py) by timing
truncated real backbones (num_stages = 1..4) and differencing; for
SlowFast it additionally splits the two pathways (slow_only / fast_only)
and measures the fast-path pack factor under training.

Reference recipe shapes:
  i3d       batch 8  x 32f @224  (/root/reference/configs -> i3d 32x2)
  slowfast  batch 8  x 64f @224  (resnet_i3d_slowfast.py:209+ tau16 a8)
  x3d       batch 16 x 16f @224  (resnet_x3d.py:381+)

Chained-fori_loop timing as bench.py (relay-safe): grad of mean(out)
w.r.t. params, K iterations inside one jit, difference two K values.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

K1, K2, REPS = 1, 5, 2


def timed(fn, x, k_pair, reps=REPS):
    import jax
    import jax.numpy as jnp
    jfn = jax.jit(fn)

    def best(k):
        k = jnp.asarray(k, jnp.int32)
        float(jfn(x, k))
        b = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jfn(x, k))
            b = min(b, time.perf_counter() - t0)
        return b

    k1, k2 = k_pair
    return (best(k2) - best(k1)) / (k2 - k1)


def grad_time(bb_cfg, shape, k_pair, backward=True, train_mode=True):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvfnet_tpu.models import build_backbone

    bb = build_backbone(bb_cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    variables = bb.init(jax.random.PRNGKey(0), x, train=True)
    params = variables['params']
    bs = variables.get('batch_stats', {})

    if train_mode:
        def loss(p, v):
            out, _ = bb.apply({'params': p, 'batch_stats': bs}, v,
                              train=True, mutable=['batch_stats'])
            return sum(jnp.mean(leaf.astype(jnp.float32))
                       for leaf in jax.tree_util.tree_leaves(out))
    else:  # the dense-eval program: BN running stats, no mutable
        def loss(p, v):
            out = bb.apply({'params': p, 'batch_stats': bs}, v, train=False)
            return sum(jnp.mean(leaf.astype(jnp.float32))
                       for leaf in jax.tree_util.tree_leaves(out))

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
    return timed(step, x, k_pair)


def family_variants(family, ns_list, dtype):
    """Yield (variant_name, backbone_cfg, input_shape)."""
    if family == 'i3d':
        for ns in ns_list:
            yield f'trunc{ns}', dict(
                type='ResNet_I3D', depth=50, num_stages=ns,
                out_indices=(ns - 1,),
                spatial_strides=(1, 2, 2, 2)[:ns],
                temporal_strides=(1, 1, 1, 1)[:ns],
                dilations=(1, 1, 1, 1)[:ns],
                inflate_freq=(1, 1, 1, 1)[:ns], inflate_style='3x1x1',
                conv1_kernel=(5, 7, 7), conv1_stride_t=2, pool1_stride_t=2,
                norm_eval=False,
                norm_cfg=dict(type='BN3d', requires_grad=True),
                dtype=dtype), (8, 32, 224, 224, 3)
    elif family == 'x3d':
        for ns in ns_list:
            yield f'trunc{ns}', dict(
                type='ResNet_X3D', depth=50, num_stages=ns,
                out_indices=(ns - 1,),
                spatial_strides=(1, 2, 2, 2)[:ns],
                temporal_strides=(1, 1, 1, 1)[:ns],
                dilations=(1, 1, 1, 1)[:ns],
                inflate_freq=(1, 1, 1, 1)[:ns],
                ratio_width=1, ratio_bottleneck=2.25,
                inflate_style='mobile', norm_eval=False,
                norm_cfg=dict(type='BN3d', requires_grad=True),
                dtype=dtype), (16, 16, 224, 224, 3)
    elif family == 'slowfast':
        base = dict(type='ResNet_I3D_SlowFast', depth=50, tau=16, alpha=8,
                    beta_inv=8, slow_inflate_freq=(0, 0, 1, 1),
                    fast_inflate_freq=(1, 1, 1, 1), norm_eval=False,
                    norm_cfg=dict(type='BN3d', requires_grad=True),
                    dtype=dtype)
        shape = (8, 64, 224, 224, 3)
        yield 'slow_only', dict(base, slow_only=True, out_indices=(3,)), \
            shape
        yield 'fast_only', dict(base, fast_only=True, out_indices=(3,)), \
            shape
        yield 'fast_only_pack8', dict(base, fast_only=True, fast_pack=8,
                                      out_indices=(3,)), shape
        for p in (4, 16):
            yield f'fast_only_pack{p}', dict(base, fast_only=True,
                                             fast_pack=p,
                                             out_indices=(3,)), shape
            yield f'full_pack{p}', dict(base, fast_pack=p,
                                        out_indices=(3,)), shape
        for ns in ns_list:
            yield f'trunc{ns}', dict(
                base, num_stages=ns, out_indices=(ns - 1,),
                spatial_strides=(1, 2, 2, 2)[:ns],
                dilations=(1, 1, 1, 1)[:ns],
                slow_inflate_freq=(0, 0, 1, 1)[:ns],
                fast_inflate_freq=(1, 1, 1, 1)[:ns]), shape
        yield 'full_pack8', dict(base, fast_pack=8, out_indices=(3,)), shape
    else:
        raise SystemExit(f'unknown family {family}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--families', nargs='+',
                   default=['i3d', 'slowfast', 'x3d'],
                   choices=['i3d', 'slowfast', 'x3d'])
    p.add_argument('--stages', type=int, nargs='+', default=[1, 2, 3, 4])
    p.add_argument('--variants', nargs='+', default=None,
                   help='restrict to these variant names')
    p.add_argument('--fwd-only', action='store_true')
    p.add_argument('--eval-geometry', action='store_true',
                   help='time the dense-test program instead of the train '
                        'recipe: 30 ThreeCrop x 10-clip views at 256^2, '
                        'eval-mode BN, implies --fwd-only')
    p.add_argument('--k', type=int, nargs=2, default=(K1, K2))
    args = p.parse_args()
    if args.eval_geometry:
        args.fwd_only = True

    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    k_pair = tuple(args.k) if on_tpu else (1, 2)
    print('backend:', jax.default_backend(), flush=True)

    for family in args.families:
        results = {}
        for name, cfg, shape in family_variants(family, args.stages, dtype):
            if args.variants and name not in args.variants:
                continue
            if args.eval_geometry:
                # dense-test geometry: 30 views (ThreeCrop x 10 clips) at
                # 256^2, one video's program (view_chunk=30 shape)
                shape = (30, shape[1], 256, 256, 3)
            if not on_tpu:  # CPU smoke: shrink
                shape = (2, shape[1] // 4 if family != 'slowfast' else 16,
                         64, 64, 3)
            t = grad_time(cfg, shape, k_pair,
                          backward=not args.fwd_only,
                          train_mode=not args.eval_geometry)
            results[name] = round(t * 1e3, 2)
            print(json.dumps({'family': family, 'variant': name,
                              'ms': results[name],
                              'batch': shape[0]}), flush=True)
        marg = {f'stage{i}_marginal_ms':
                round(results[f'trunc{i}'] - results[f'trunc{i-1}'], 2)
                for i in range(2, 5)
                if f'trunc{i}' in results and f'trunc{i-1}' in results}
        if marg:
            print(json.dumps(dict(family=family, **marg)), flush=True)


if __name__ == '__main__':
    main()
