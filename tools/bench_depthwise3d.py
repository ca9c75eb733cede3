#!/usr/bin/env python3
"""Probe: alternative formulations of X3D's depthwise 3x3x3 convs.

Round-3 partition (`tools/bench_train_partition3d.py`): X3D stem+stage1
is 84% of its train step, and within that the stage-1 depthwise 3x3x3
convs (54 ch at 112^2/56^2, `resnet_x3d.py:113-116`) are the work. A
depthwise conv uses no MXU — it is a 27-tap VPU stencil — so the
question is which lowering moves the bytes fastest:

  conv   XLA depthwise conv (feature_group_count=C), the shipped form
  shift  27 shifted multiply-adds on the padded input — pure
         elementwise ops XLA can fuse freely (no conv lowering)
  dense  a DENSE 3x3x3 CxC conv at the same shape: 54x the MACs but on
         the MXU; exactness is recoverable later by masking the kernel
         block-diagonal, so its *rate* bounds what an MXU reformulation
         could give

All three are timed fwd and fwd+bwd at the real stage-1 shapes (batch
16 x 16f, 56^2 s1 and 112^2 s2). Prints one JSON line per point.
Isolated-probe caveat applies (see DESIGN.md round-3: two isolated wins
refuted e2e) — a winning form must be rebuilt behind a flag and
measured end to end before shipping.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

K1, K2, REPS = 2, 10, 3


def timed(step, x, reps=REPS):
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

    return (best(K2) - best(K1)) / (K2 - K1)


def make_forms(c, stride, dtype):
    import jax
    import jax.numpy as jnp

    kd = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 3, 1, c),
                           jnp.float32) * 0.1
    kdense = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, c, c),
                               jnp.float32) * 0.1

    def conv(p, v):
        return jax.lax.conv_general_dilated(
            v, p.astype(v.dtype), (1, stride, stride),
            ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
            feature_group_count=c)

    def shift(p, v):
        w = p.astype(v.dtype).reshape(3, 3, 3, c)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        t, h, wd = v.shape[1], v.shape[2], v.shape[3]
        oh = (h - 1) // stride + 1
        ow = (wd - 1) // stride + 1
        out = None
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    sl = vp[:, dt:dt + t,
                            dh:dh + h:stride,
                            dw:dw + wd:stride]
                    sl = sl[:, :, :oh, :ow]
                    term = sl * w[dt, dh, dw]
                    out = term if out is None else out + term
        return out

    def dense(p, v):
        return jax.lax.conv_general_dilated(
            v, p.astype(v.dtype), (1, stride, stride),
            ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))

    return {'conv': (conv, kd), 'shift': (shift, kd),
            'dense': (dense, kdense)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--modes', nargs='+', default=['conv', 'shift', 'dense'])
    p.add_argument('--fwd-only', action='store_true')
    p.add_argument('--check', action='store_true',
                   help='verify shift == conv numerically (CPU f32)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = (jnp.bfloat16 if jax.default_backend() == 'tpu'
             else jnp.float32)
    print('backend:', jax.default_backend(), flush=True)

    if args.check:
        forms = make_forms(8, 1, jnp.float32)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(2, 4, 8, 8, 8).astype(np.float32))
        (cf, kd), (sf, _) = forms['conv'], forms['shift']
        np.testing.assert_allclose(np.asarray(sf(kd, x)),
                                   np.asarray(cf(kd, x)),
                                   rtol=1e-5, atol=1e-5)
        forms2 = make_forms(8, 2, jnp.float32)
        (cf2, kd2), (sf2, _) = forms2['conv'], forms2['shift']
        np.testing.assert_allclose(np.asarray(sf2(kd2, x)),
                                   np.asarray(cf2(kd2, x)),
                                   rtol=1e-5, atol=1e-5)
        print('shift == conv OK (s1, s2)', flush=True)
        return

    rng = np.random.RandomState(0)
    for (size, stride) in [(56, 1), (112, 2)]:
        shape = (16, 16, size, size, 54)
        x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
        forms = make_forms(54, stride, dtype)
        for mode in args.modes:
            fn, k = forms[mode]

            def loss(p, v):
                return jnp.mean(fn(p, v).astype(jnp.float32))

            for backward in ([False] if args.fwd_only else [False, True]):
                if backward:
                    def step(v, kk, _p=k):
                        def body(i, acc):
                            l, g = jax.value_and_grad(loss)(
                                _p, v + i.astype(v.dtype) * 1e-6)
                            return acc + l + jnp.mean(g.astype(jnp.float32))
                        return jax.lax.fori_loop(
                            0, kk, body, jnp.zeros((), jnp.float32))
                else:
                    def step(v, kk, _p=k):
                        def body(i, acc):
                            return acc + loss(_p,
                                              v + i.astype(v.dtype) * 1e-6)
                        return jax.lax.fori_loop(
                            0, kk, body, jnp.zeros((), jnp.float32))
                ms = timed(step, x) * 1e3
                print(json.dumps({'mode': mode, 'size': size,
                                  'stride': stride, 'backward': backward,
                                  'ms': round(ms, 3)}), flush=True)


if __name__ == '__main__':
    main()
