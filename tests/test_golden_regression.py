"""Cross-round numerical regression guard: fixed-seed R50+MVF logits on a
fixed input must stay stable (refactors across build rounds must not drift
the forward numerics)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from mvfnet_tpu.models import build_recognizer
from test_models import r50_mvf_cfg

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'golden')
GOLDEN = os.path.join(GOLDEN_DIR, 'r50_mvf_logits.npz')


def test_forward_matches_golden():
    data = np.load(GOLDEN)
    model = build_recognizer(r50_mvf_cfg(), test_cfg=dict(average_clips=None))
    imgs0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs0,
                           jnp.zeros((1,), jnp.int32), return_loss=True,
                           train=False)
    rng = np.random.RandomState(int(data['x_seed']))
    x = rng.randn(2, 4, 32, 32, 3).astype(np.float32)
    logits = np.asarray(model.apply(variables, jnp.asarray(x), None,
                                    return_loss=False))
    np.testing.assert_allclose(logits, data['logits'], rtol=1e-4, atol=1e-5)


def test_slowfast_and_x3d_features_match_golden():
    from mvfnet_tpu.models import build_backbone
    data = np.load(os.path.join(GOLDEN_DIR, 'slowfast_x3d_feats.npz'))
    rng = np.random.RandomState(int(data['sf_seed']))

    x_sf = jnp.asarray(rng.randn(1, 16, 64, 64, 3).astype(np.float32))
    bb = build_backbone(dict(type='ResNet_I3D_SlowFast', depth=50, tau=8,
                             alpha=4, beta_inv=8, out_indices=(3,),
                             norm_eval=False, norm_cfg=dict(type='BN3d')))
    v = bb.init(jax.random.PRNGKey(0), x_sf, train=False)
    slow, fast = bb.apply(v, x_sf, train=False)
    np.testing.assert_allclose(np.asarray(slow), data['slow'],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast), data['fast'],
                               rtol=1e-4, atol=1e-5)

    x_x3d = jnp.asarray(rng.randn(1, 8, 64, 64, 3).astype(np.float32))
    bb2 = build_backbone(dict(type='ResNet_X3D', depth=50, norm_eval=False,
                              norm_cfg=dict(type='BN3d')))
    v2 = bb2.init(jax.random.PRNGKey(0), x_x3d, train=False)
    y = bb2.apply(v2, x_x3d, train=False)
    np.testing.assert_allclose(np.asarray(y), data['x3d'],
                               rtol=1e-4, atol=1e-5)


def test_i3d_forward_matches_golden():
    from test_models_3d import i3d_cfg
    data = np.load(os.path.join(GOLDEN_DIR, 'i3d_r50_logits.npz'))
    model = build_recognizer(i3d_cfg(), test_cfg=dict(average_clips=None))
    imgs0 = jnp.zeros((1, 1, 8, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs0,
                           jnp.zeros((1,), jnp.int32), return_loss=True,
                           train=False)
    rng = np.random.RandomState(int(data['x_seed']))
    x = rng.randn(2, 1, 8, 32, 32, 3).astype(np.float32)
    logits = np.asarray(model.apply(variables, jnp.asarray(x), None,
                                    return_loss=False))
    np.testing.assert_allclose(logits, data['logits'], rtol=1e-4, atol=1e-5)
