"""X3D space-to-depth stage re-layout (ops/s2d.py + resnet_x3d.py).

The re-layout is a measured end-to-end loser on v5e (default off — see
resnet_x3d.py and docs/DESIGN.md), but it must stay *exact*: same
parameters through either path, same outputs, and the layout helpers must
be true inverses.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mvfnet_tpu.models import build_backbone
from mvfnet_tpu.ops.s2d import (depth_to_space, enter_kernel_2x2, kron4_1x1,
                                space_to_depth)


def _x(seed, *shape):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32))


def test_s2d_roundtrip_and_phase_order():
    x = _x(0, 2, 3, 8, 6, 5)
    s = space_to_depth(x)
    assert s.shape == (2, 3, 4, 3, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space(s)),
                                  np.asarray(x))
    # phase-major: channel block p holds original pixel (2i+py, 2j+px)
    for py in range(2):
        for px in range(2):
            p = 2 * py + px
            np.testing.assert_array_equal(
                np.asarray(s[..., p * 5:(p + 1) * 5]),
                np.asarray(x[:, :, py::2, px::2, :]))


def test_kron_and_enter_kernels_match_pointwise_conv():
    c, p = 5, 7
    x = _x(1, 1, 2, 8, 6, c)
    w = _x(2, 1, 1, 1, c, p) * 0.3
    dn = ('NTHWC', 'THWIO', 'NTHWC')
    want = jax.lax.conv_general_dilated(x, w, (1, 1, 1), 'VALID',
                                        dimension_numbers=dn)
    # kron 1x1 on s2d input == pointwise conv, s2d'd
    got = jax.lax.conv_general_dilated(
        space_to_depth(x), kron4_1x1(w), (1, 1, 1), 'VALID',
        dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(depth_to_space(got)),
                               np.asarray(want), rtol=1e-5, atol=1e-6)
    # 2x2/s2 scatter kernel on dense input == pointwise conv entering s2d
    got2 = jax.lax.conv_general_dilated(
        x, enter_kernel_2x2(w), (1, 2, 2), 'VALID', dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(depth_to_space(got2)),
                               np.asarray(want), rtol=1e-5, atol=1e-6)


def test_x3d_s2d_path_matches_standard():
    """Same variables, either compute path, equal features — including the
    strided stage-2 block0 with its phase-0 downsample."""
    x = _x(3, 1, 8, 64, 64, 3)
    kw = dict(type='ResNet_X3D', depth=50, norm_eval=False,
              norm_cfg=dict(type='BN3d'))
    std = build_backbone(dict(kw, s2d_stages=()))
    s2d = build_backbone(dict(kw, s2d_stages=(0, 1)))
    v = std.init(jax.random.PRNGKey(0), x, train=False)
    y_std = std.apply(v, x, train=False)
    y_s2d = s2d.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_std),
                               rtol=2e-5, atol=2e-6)
    # variable trees are interchangeable in the other direction too
    v2 = s2d.init(jax.random.PRNGKey(0), x, train=False)
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, v, v2))
    assert chex_equal
    # and train-mode apply (standard path) works from s2d-initialized vars
    out, mut = s2d.apply(v2, x, train=True, mutable=['batch_stats'])
    assert out.shape == y_std.shape
    assert 'batch_stats' in mut
