"""Breadth smoke tests: SlowFast, X3D, BNInception, InceptionV1-I3D, R3D,
MobileNetV2(+MVF/TSM), RecognizerC2D."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvfnet_tpu.models import build_backbone, build_recognizer


def _run_backbone(cfg, x):
    bb = build_backbone(cfg)
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    return bb.apply(variables, x, train=False)


class TestSlowFast:
    def test_two_pathway_shapes(self):
        y = _run_backbone(
            dict(type='ResNet_I3D_SlowFast', depth=50, tau=8, alpha=4,
                 beta_inv=8, out_indices=(3,), norm_eval=False,
                 norm_cfg=dict(type='BN3d')),
            jnp.zeros((1, 32, 64, 64, 3)))
        slow, fast = y
        # slow: T=32/8=4 frames, 64->2 spatial; fast: T=32/2=16
        assert slow.shape == (1, 4, 2, 2, 2048)
        assert fast.shape == (1, 16, 2, 2, 256)

    def test_slow_only(self):
        y = _run_backbone(
            dict(type='ResNet_I3D_SlowFast', depth=50, tau=8,
                 slow_only=True, out_indices=(3,), norm_eval=False,
                 norm_cfg=dict(type='BN3d')),
            jnp.zeros((1, 16, 64, 64, 3)))
        assert y.shape == (1, 2, 2, 2, 2048)


class TestX3D:
    def test_forward_shape(self):
        y = _run_backbone(
            dict(type='ResNet_X3D', depth=50, norm_eval=False,
                 norm_cfg=dict(type='BN3d')),
            jnp.zeros((1, 8, 64, 64, 3)))
        assert y.shape == (1, 1, 1, 1, 2048)


class TestBNInception:
    def test_feature_map(self):
        y = _run_backbone(dict(type='BNInception', bn_eval=False),
                          jnp.zeros((2, 64, 64, 3)))
        # 1024 channels at 1/32 resolution (reference returns 5b concat)
        assert y.shape == (2, 2, 2, 1024)


class TestInceptionI3D:
    def test_feature_map(self):
        y = _run_backbone(dict(type='InceptionV1_I3D', bn_eval=False),
                          jnp.zeros((1, 16, 64, 64, 3)))
        # T/8, H/32, W/32, 1024
        assert y.shape == (1, 2, 2, 2, 1024)

    def test_flow_modality(self):
        y = _run_backbone(dict(type='InceptionV1_I3D', bn_eval=False,
                               modality='Flow'),
                          jnp.zeros((1, 16, 32, 32, 2)))
        assert y.shape[-1] == 1024


class TestR3D:
    def test_r2plus1d_34(self):
        y = _run_backbone(
            dict(type='ResNet_R3D', depth=34, block_type='2.5d',
                 bn_eval=False),
            jnp.zeros((1, 4, 32, 32, 3)))
        # spatial /16 (stem /2 + 3 stage downsamples), temporal /8
        assert y.shape[-1] == 512

    def test_r3d_bottleneck_50(self):
        y = _run_backbone(
            dict(type='ResNet_R3D', depth=50, block_type='3d',
                 bn_eval=False, use_pool1=True),
            jnp.zeros((1, 4, 32, 32, 3)))
        assert y.shape[-1] == 2048

    def test_middle_filter_formula(self):
        """R(2+1)D middle channels: 3*i*o*9 / (i*9 + 3*o)."""
        from mvfnet_tpu.models.backbones.resnet_r3d import _Conv3DBlock
        blk = _Conv3DBlock(64, 64, (3, 3, 3), (1, 1, 1), (1, 1, 1), '2.5d')
        variables = blk.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 2, 8, 8, 64)), True)
        mid = variables['params']['conv_s']['kernel'].shape[-1]
        assert mid == int(3 * 64 * 64 * 9 / (64 * 9 + 3 * 64))  # 144


class TestMobileNetV2:
    def test_plain_and_mvf(self):
        y = _run_backbone(dict(type='MobileNetV2', norm_eval=False),
                          jnp.zeros((2, 64, 64, 3)))
        assert y.shape == (2, 2, 2, 1280)
        cfg = dict(
            type='Recognizer2D',
            backbone=dict(type='MobileNetV2', norm_eval=False),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=1280, init_std=0.01, num_classes=3),
            module_cfg=dict(type='MVF', n_segment=2, alpha=0.25,
                            mode='THW'))
        model = build_recognizer(cfg, test_cfg=dict(average_clips='prob'))
        imgs = jnp.zeros((1, 2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), imgs,
                               jnp.zeros((1,), jnp.int32),
                               return_loss=True, train=False)
        # MVF present inside identity blocks with expansion
        flat = jax.tree_util.tree_leaves_with_path(variables['params'])
        names = {'/'.join(str(k.key) for k in path)
                 for path, _ in flat}
        assert any('MVF_0/shift_conv' in n for n in names)
        score = model.apply(variables, imgs, None, return_loss=False)
        assert score.shape == (1, 3)

    def test_tsm_insertion(self):
        from mvfnet_tpu.models.modules.tsm import TemporalShift
        ts = TemporalShift(n_segment=4, n_div=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 16))
        y = ts.apply({}, x)
        assert y.shape == x.shape
        x5 = x.reshape(2, 4, 4, 4, 16)
        y5 = np.asarray(y).reshape(2, 4, 4, 4, 16)
        # first fold shifted backward: y[t] = x[t+1]
        np.testing.assert_allclose(y5[:, 0, ..., :2],
                                   np.asarray(x5)[:, 1, ..., :2])
        # boundary zeros
        np.testing.assert_allclose(y5[:, -1, ..., :2], 0)
        # last channels untouched
        np.testing.assert_allclose(y5[..., 4:], np.asarray(x5)[..., 4:])


class TestRecognizerC2D:
    def test_forward(self):
        cfg = dict(
            type='RecognizerC2D',
            backbone=dict(type='ResNet_I3D', depth=50, out_indices=(3,),
                          norm_eval=False, norm_cfg=dict(type='BN3d')),
            cls_head=dict(type='I3DClsHead', spatial_size=-1,
                          temporal_size=-1, dropout_ratio=0.5,
                          in_channels=2048, num_classes=5))
        model = build_recognizer(cfg, test_cfg=dict(average_clips='score'))
        imgs = jnp.zeros((1, 1, 8, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), imgs,
                               jnp.zeros((1,), jnp.int32),
                               return_loss=True, train=False)
        score = model.apply(variables, imgs, None, return_loss=False)
        assert score.shape == (1, 5)
