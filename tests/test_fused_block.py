"""Fused eval-bottleneck kernel study (ops/fused_block.py).

The kernel is a measured negative result (it loses to XLA on v5e — see its
module docstring and docs/DESIGN.md "Pallas study") and is never selected
by the model, but it stays tested so the measurement remains reproducible:
the Pallas kernel (interpret mode on CPU) must match the folded-BN jnp
composition, and both must match the unfused conv/BN/relu math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvfnet_tpu.ops import fused_block as fb


def _mk(seed, *shape):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * 0.2)


def _args(cin, cm):
    w1 = _mk(1, cin, cm)
    w2 = _mk(2, 3, 3, cm, cm)
    w3 = _mk(3, cm, cin)
    b1, b2, b3 = _mk(4, 1, cm), _mk(5, 1, cm), _mk(6, 1, cin)
    return w1, b1, w2, b2, w3, b3


@pytest.mark.parametrize('shape,cm', [((2, 8, 8, 32), 16),
                                      ((1, 6, 10, 24), 8)])
def test_pallas_interpret_matches_jnp(shape, cm):
    x = _mk(0, *shape)
    args = _args(shape[-1], cm)
    want = fb.bottleneck_eval_jnp(x, *args)
    old = fb.INTERPRET
    fb.INTERPRET = True
    try:
        got = fb.bottleneck_eval_pallas(x, *args)
    finally:
        fb.INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_matches_unfused_bottleneck():
    """BN folding: the folded composition equals conv->BN->relu chains."""
    cin, cm = 32, 16
    x = _mk(0, 2, 8, 8, cin)
    k1, k2, k3 = _mk(1, 1, 1, cin, cm), _mk(2, 3, 3, cm, cm), _mk(3, 1, 1,
                                                                  cm, cin)
    bn = {}
    for i, c in ((1, cm), (2, cm), (3, cin)):
        bn[i] = dict(scale=_mk(10 + i, c), bias=_mk(20 + i, c),
                     mean=_mk(30 + i, c),
                     var=jnp.abs(_mk(40 + i, c)) + 0.5)

    def conv(v, w, ):
        pad = ((w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2)
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), pad, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def bn_eval(v, p):
        inv = p['scale'] * jax.lax.rsqrt(p['var'] + 1e-5)
        return (v - p['mean']) * inv + p['bias']

    h = jnp.maximum(bn_eval(conv(x, k1), bn[1]), 0)
    h = jnp.maximum(bn_eval(conv(h, k2), bn[2]), 0)
    want = jnp.maximum(bn_eval(conv(h, k3), bn[3]) + x, 0)

    folded = []
    for k, i in ((k1, 1), (k2, 2), (k3, 3)):
        w, b = fb.fold_bn(k, bn[i]['scale'], bn[i]['bias'], bn[i]['mean'],
                          bn[i]['var'])
        folded += [w.reshape(w.shape[-2:]) if w.shape[0] == 1 else w,
                   b.reshape(1, -1)]
    got = fb.bottleneck_eval_jnp(x, *folded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_never_auto_selected():
    assert not fb.use_pallas((240, 64, 64, 256), 64, jnp.bfloat16)
