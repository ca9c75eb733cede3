"""Flow-modality end-to-end: pipeline channel fold + stem inflation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvfnet_tpu.data.transforms import FormatShape
from mvfnet_tpu.models import build_recognizer


class TestFlowFormatShape:
    def test_nhwc_fold_matches_nchw_reshape(self):
        """NHWC fold must equal the reference's free NCHW reshape
        (recognizer2d.py:137): (M,2,H,W) -> view(M/5, 10, H, W)."""
        rng = np.random.RandomState(0)
        # 1 clip x 5 frames of x/y grayscale pairs
        frames = [rng.randint(0, 255, (8, 6), np.uint8) for _ in range(10)]
        res_nhwc = FormatShape('NHWC')(
            dict(img_group=[f.copy() for f in frames], modality='Flow',
                 num_clips=1, clip_len=5))
        res_nchw = FormatShape('NCHW')(
            dict(img_group=[f.copy() for f in frames], modality='Flow',
                 num_clips=1, clip_len=5))
        nchw = res_nchw['img_group']                      # (5, 2, 8, 6)
        folded_ref = nchw.reshape(1, 10, 8, 6)            # NCHW free fold
        ours = res_nhwc['img_group']                      # (1, 8, 6, 10)
        np.testing.assert_array_equal(ours.transpose(0, 3, 1, 2),
                                      folded_ref)

    def test_flow_recognizer_forward(self):
        cfg = dict(
            type='Recognizer2D',
            modality='Flow',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=512, init_std=0.01, num_classes=3),
        )
        model = build_recognizer(cfg, test_cfg=dict(average_clips='prob'))
        assert model.in_channels == 10
        # (B, segments, H, W, 10)
        imgs = jnp.zeros((1, 2, 32, 32, 10))
        variables = model.init(jax.random.PRNGKey(0), imgs,
                               jnp.zeros((1,), jnp.int32),
                               return_loss=True, train=False)
        # stem conv consumes 10 channels
        assert variables['params']['backbone_mod']['conv1'][
            'kernel'].shape[2] == 10
        score = model.apply(variables, imgs, None, return_loss=False)
        assert score.shape == (1, 3)

    def test_flow_inflation_on_import(self):
        """RGB stem weights inflate to 10 channels: mean over RGB then
        broadcast (recognizer2d.py:115-119)."""
        from mvfnet_tpu.utils.checkpoint import import_torch_weights
        cfg = dict(
            type='Recognizer2D', modality='Flow',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=512, init_std=0.01, num_classes=3))
        model = build_recognizer(cfg, test_cfg=dict(average_clips='prob'))
        imgs = jnp.zeros((1, 2, 32, 32, 10))
        variables = model.init(jax.random.PRNGKey(0), imgs,
                               jnp.zeros((1,), jnp.int32),
                               return_loss=True, train=False)
        rng = np.random.RandomState(1)
        rgb_stem = rng.randn(64, 3, 7, 7).astype(np.float32)
        new_vars = import_torch_weights({'conv1.weight': rgb_stem},
                                        variables,
                                        inflate_in_channels=10)
        got = new_vars['params']['backbone_mod']['conv1']['kernel']
        assert got.shape == (7, 7, 10, 64)
        expect = rgb_stem.mean(axis=1)  # (64, 7, 7)
        for c in range(10):
            np.testing.assert_allclose(got[:, :, c, :],
                                       expect.transpose(1, 2, 0), rtol=1e-6)
