"""SlowFast fast-pathway time-to-channel packing (``fast_pack``).

The packed fast path (`mvfnet_tpu/ops/tpack.py` +
`models/backbones/packed3d.py`) must be an exact re-layout of the standard
path — same parameter tree, same outputs (float reassociation only), same
train-mode BatchNorm statistics — while lifting the MXU lane fill of the
thin fast-pathway convs (reference
``codes/models/backbones/resnet_i3d_slowfast.py:83-207``).
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from mvfnet_tpu.models import build_backbone
from mvfnet_tpu.ops.tpack import pack_kernel, pack_t, unpack_t


def sf_cfg(**overrides):
    cfg = dict(type='ResNet_I3D_SlowFast', depth=50, tau=8, alpha=4,
               beta_inv=8, out_indices=(3,), norm_eval=False,
               norm_cfg=dict(type='BN3d'),
               slow_inflate_freq=(0, 0, 1, 1),
               fast_inflate_freq=(1, 1, 1, 1))
    cfg.update(overrides)
    return cfg


class TestPackOps:
    def test_pack_unpack_roundtrip(self):
        x = jnp.arange(2 * 16 * 3 * 3 * 5, dtype=jnp.float32).reshape(
            2, 16, 3, 3, 5)
        for p in (2, 4, 8):
            np.testing.assert_array_equal(unpack_t(pack_t(x, p), p), x)

    @pytest.mark.parametrize('kshape,stride,dil', [
        ((1, 1, 1), (1, 1, 1), 1),
        ((3, 1, 1), (1, 1, 1), 1),
        ((1, 3, 3), (1, 2, 2), 1),
        ((3, 3, 3), (1, 1, 1), 1),
        ((1, 3, 3), (1, 1, 1), 2),
        ((5, 1, 1), (1, 1, 1), 1),
    ])
    def test_packed_conv_matches_direct(self, kshape, stride, dil):
        from jax import lax
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 6, 5, 4).astype(np.float32))
        w = jnp.asarray(rng.randn(*kshape, 4, 6).astype(np.float32))
        dn = ('NTHWC', 'THWIO', 'NTHWC')
        pads = tuple((((k - 1) // 2 * d),) * 2
                     for k, d in zip(kshape, (1, dil, dil)))
        ref = lax.conv_general_dilated(x, w, stride, pads,
                                       rhs_dilation=(1, dil, dil),
                                       dimension_numbers=dn)
        for p in (2, 4, 8):
            wp, t_pad = pack_kernel(w, p)
            got = lax.conv_general_dilated(
                pack_t(x, p), wp, (1,) + stride[1:],
                ((t_pad, t_pad),) + pads[1:],
                rhs_dilation=(1, dil, dil), dimension_numbers=dn)
            np.testing.assert_allclose(unpack_t(got, p), ref,
                                       rtol=1e-4, atol=1e-5)


class TestFastPack:
    def _build_pair(self, **over):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 32, 32, 32, 3).astype(np.float32))
        bb = build_backbone(sf_cfg(**over))
        bbp = build_backbone(sf_cfg(fast_pack=8, **over))
        v = bb.init(jax.random.PRNGKey(0), x, train=False)
        return x, bb, bbp, v

    def test_param_tree_identical_and_eval_equal(self):
        x, bb, bbp, v = self._build_pair()
        vp = bbp.init(jax.random.PRNGKey(0), x, train=False)
        assert jtu.tree_map(jnp.shape, v) == jtu.tree_map(jnp.shape, vp)
        slow, fast = bb.apply(v, x, train=False)
        slow_p, fast_p = bbp.apply(v, x, train=False)  # same variables
        np.testing.assert_allclose(slow_p, slow, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(fast_p, fast, rtol=1e-4, atol=1e-5)

    def test_train_mode_outputs_and_batch_stats_match(self):
        x, bb, bbp, v = self._build_pair()
        o1, m1 = bb.apply(v, x, train=True, mutable=['batch_stats'])
        o2, m2 = bbp.apply(v, x, train=True, mutable=['batch_stats'])
        for a, b in zip(jtu.tree_leaves(o1), jtu.tree_leaves(o2)):
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=2e-3)
        jtu.tree_map(lambda a, b: np.testing.assert_allclose(
            b, a, rtol=1e-4, atol=1e-5), m1, m2)

    def test_non_divisible_t_degrades_to_largest_divisor(self):
        # input T=24 -> fast T=12 -> fast_pack=8 degrades to 6 (still exact)
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 24, 16, 16, 3).astype(np.float32))
        bb = build_backbone(sf_cfg())
        bbp = build_backbone(sf_cfg(fast_pack=8))
        assert bbp._fast_pack_factor(12) == 6
        v = bb.init(jax.random.PRNGKey(0), x, train=False)
        slow, fast = bb.apply(v, x, train=False)
        slow_p, fast_p = bbp.apply(v, x, train=False)
        np.testing.assert_allclose(slow_p, slow, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(fast_p, fast, rtol=1e-4, atol=1e-5)

    def test_basic_block_depth_ignores_fast_pack(self):
        bbp = build_backbone(sf_cfg(depth=18, fast_pack=8))
        assert bbp._fast_pack_factor(32) == 0

    def test_fast_only_mode_packs(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 32, 16, 16, 3).astype(np.float32))
        bb = build_backbone(sf_cfg(fast_only=True))
        bbp = build_backbone(sf_cfg(fast_only=True, fast_pack=8))
        v = bb.init(jax.random.PRNGKey(0), x, train=False)
        np.testing.assert_allclose(bbp.apply(v, x, train=False),
                                   bb.apply(v, x, train=False),
                                   rtol=1e-4, atol=1e-5)

    def test_golden_fixture_with_fast_pack(self):
        """The packed backbone reproduces the round-1 golden features."""
        import os
        golden = os.path.join(os.path.dirname(__file__), 'golden',
                              'slowfast_x3d_feats.npz')
        data = np.load(golden)
        rng = np.random.RandomState(int(data['sf_seed']))
        x = jnp.asarray(rng.randn(1, 16, 64, 64, 3).astype(np.float32))
        bbp = build_backbone(sf_cfg(fast_pack=8))
        v = bbp.init(jax.random.PRNGKey(0), x, train=False)
        slow, fast = bbp.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(slow), data['slow'],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fast), data['fast'],
                                   rtol=1e-4, atol=1e-4)
