"""3-D model family tests: I3D backbone/recognizer, non-local, CoST."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvfnet_tpu.models import build_recognizer


def i3d_cfg(**overrides):
    cfg = dict(
        type='Recognizer3D',
        backbone=dict(
            type='ResNet_I3D',
            depth=50,
            out_indices=(3,),
            norm_eval=False,
            inflate_freq=(1, 1, 1, 1),
            inflate_style='3x1x1',
            conv1_kernel=(5, 7, 7),
            conv1_stride_t=2,
            pool1_stride_t=2,
            norm_cfg=dict(type='BN3d', requires_grad=True)),
        cls_head=dict(
            type='I3DClsHead',
            spatial_size=-1,
            temporal_size=-1,
            dropout_ratio=0.5,
            in_channels=2048,
            num_classes=7),
    )
    cfg.update(overrides)
    return cfg


class TestI3D:
    def test_forward_shapes_and_temporal_downsampling(self):
        model = build_recognizer(i3d_cfg(),
                                 test_cfg=dict(average_clips='prob'))
        # (B, clips, T, H, W, C)
        imgs = jnp.zeros((1, 1, 16, 32, 32, 3), jnp.float32)
        labels = jnp.zeros((1,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), imgs, labels,
                               return_loss=True, train=False)
        losses, _ = model.apply(variables, imgs, labels, return_loss=True,
                                train=True, rngs={'dropout': jax.random.PRNGKey(1)},
                                mutable=['batch_stats'])
        assert np.isfinite(float(losses['loss_cls']))
        # dense test: 2 clips
        timgs = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 16, 32, 32, 3))
        score = model.apply(variables, timgs, None, return_loss=False)
        assert score.shape == (1, 7)
        np.testing.assert_allclose(float(np.asarray(score).sum()), 1.0,
                                   rtol=1e-5)

    def test_temporal_stride_chain(self):
        """conv1_stride_t=2, pool1_stride_t=2, pool2 after layer1 (stride 2):
        T=16 -> features T=2 at layer4."""
        from mvfnet_tpu.models import build_backbone
        bb = build_backbone(dict(
            type='ResNet_I3D', depth=50, out_indices=(3,),
            norm_eval=False, norm_cfg=dict(type='BN3d')))
        x = jnp.zeros((1, 16, 32, 32, 3))
        variables = bb.init(jax.random.PRNGKey(0), x, train=False)
        y = bb.apply(variables, x, train=False)
        assert y.shape == (1, 2, 1, 1, 2048)

    def test_slowfast_head(self):
        from mvfnet_tpu.models.heads.i3d_head import I3DSlowFastClsHead
        head = I3DSlowFastClsHead(in_channels=24, num_classes=5)
        slow = jnp.zeros((2, 4, 2, 2, 16))
        fast = jnp.zeros((2, 8, 2, 2, 8))
        variables = head.init(jax.random.PRNGKey(0), (slow, fast))
        out = head.apply(variables, (slow, fast))
        assert out.shape == (2, 5)


class TestNonLocal:
    def test_local_attention_shape_and_residual(self):
        from mvfnet_tpu.models.modules.nonlocal_attention import LocalAttention
        la = LocalAttention(dim=8, hidden=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 6, 5, 8))
        variables = la.init(jax.random.PRNGKey(1), x)
        y = la.apply(variables, x)
        assert y.shape == x.shape
        # conv_out starts random but BN bias=0, gamma=1: output differs from x
        assert not np.allclose(np.asarray(y), np.asarray(x))

    def test_insertion_indices_match_reference_quirk(self):
        from mvfnet_tpu.models.modules.nonlocal_attention import (
            nonlocal_block_indices)
        assert nonlocal_block_indices(4, 2) == (1, 3)     # R50/101 layer2
        assert nonlocal_block_indices(6, 3) == (1, 3, 5)  # R50 layer3
        assert nonlocal_block_indices(23, 3) == ()        # R101 quirk

    def test_recognizer2d_with_nonlocal(self):
        cfg = dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=512, init_std=0.01, num_classes=4),
            nonlocal_cfg=dict(n_segment=2),
        )
        model = build_recognizer(cfg, test_cfg=dict(average_clips='prob'))
        imgs = jnp.zeros((1, 2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), imgs,
                               jnp.zeros((1,), jnp.int32), return_loss=True,
                               train=False)
        bb = variables['params']['backbone_mod']
        assert 'nonlocal2_1' in bb  # layer2 idx 1 (len 2 -> stride 1.0... )
        score = model.apply(variables, imgs, None, return_loss=False)
        assert score.shape == (1, 4)


class TestCoST:
    def test_cost_replaces_conv2_of_nonfirst_blocks(self):
        cfg = dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=2048, init_std=0.01, num_classes=4),
            module_cfg=dict(type='CoST', n_segment=2,
                            shift_freq=(0, 0, 0, 1)),
        )
        model = build_recognizer(cfg, test_cfg=dict(average_clips='prob'))
        imgs = jnp.zeros((1, 2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), imgs,
                               jnp.zeros((1,), jnp.int32), return_loss=True,
                               train=False)
        bb = variables['params']['backbone_mod']
        # first block keeps conv2; later blocks replace it with CoST
        assert 'conv2' in bb['layer4_0']
        assert 'CoST_0' in bb['layer4_1'] and 'conv2' not in bb['layer4_1']
        assert bb['layer4_1']['CoST_0']['shift_conv'].shape == (3, 3, 512, 512)
        score = model.apply(variables, imgs, None, return_loss=False)
        assert score.shape == (1, 4)


class TestViewChunk:
    def test_chunked_dense_test_matches_unchunked(self):
        """test_cfg['view_chunk'] must not change scores — it only re-groups
        the folded view batch into smaller backbone calls (a measured
        throughput optimization for SlowFast-class models, DESIGN.md)."""
        base = i3d_cfg()
        m_full = build_recognizer(base, test_cfg=dict(average_clips='prob'))
        m_chunk = build_recognizer(base, test_cfg=dict(average_clips='prob',
                                                       view_chunk=2))
        imgs = jax.random.normal(jax.random.PRNGKey(3),
                                 (1, 6, 8, 32, 32, 3))
        variables = m_full.init(jax.random.PRNGKey(0), imgs, None,
                                return_loss=False, train=False)
        s_full = np.asarray(m_full.apply(variables, imgs, None,
                                         return_loss=False))
        s_chunk = np.asarray(m_chunk.apply(variables, imgs, None,
                                           return_loss=False))
        np.testing.assert_allclose(s_chunk, s_full, rtol=2e-5, atol=1e-6)

    def test_non_divisible_chunk_falls_back(self):
        m = build_recognizer(i3d_cfg(), test_cfg=dict(average_clips='prob',
                                                      view_chunk=4))
        imgs = jax.random.normal(jax.random.PRNGKey(4),
                                 (1, 6, 8, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(0), imgs, None,
                           return_loss=False, train=False)
        score = m.apply(variables, imgs, None, return_loss=False)
        assert score.shape == (1, 7)
