"""TRN consensus heads + feature-extraction path."""

import json
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvfnet_tpu.models import build_recognizer


class TestTRNConsensus:
    def _head_cfg(self, ctype, num_frames=4):
        return dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                    dropout_ratio=0.5, in_channels=64, init_std=0.01,
                    num_classes=5,
                    consensus_cfg=dict(type=ctype, num_frames=num_frames))

    @pytest.mark.parametrize('ctype', ['TRN', 'TRNmultiscale'])
    def test_forward_shapes(self, ctype):
        from mvfnet_tpu.models.builder import build_head
        head = build_head(self._head_cfg(ctype))
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 3, 3, 64))
        variables = head.init(jax.random.PRNGKey(1), x, 4)
        out = head.apply(variables, x, 4)
        assert out.shape == (2, 5)
        assert np.isfinite(np.asarray(out)).all()
        # TRN embeds frames to 256-d before relations
        assert variables['params']['fc']['kernel'].shape == (64, 256)

    def test_multiscale_has_per_scale_mlps(self):
        from mvfnet_tpu.models.heads.consensus import RelationModuleMultiScale
        trn = RelationModuleMultiScale(img_feature_dim=16, num_frames=4,
                                       num_classes=3)
        x = jnp.zeros((2, 4, 16))
        variables = trn.init(jax.random.PRNGKey(0), x)
        names = set(variables['params'])
        # scales 4,3,2 each with fc1/fc2
        assert {'fc_fusion_0_fc1', 'fc_fusion_1_fc1',
                'fc_fusion_2_fc1'} <= names


class TestFeatureExtraction:
    def test_recognizer2d_extract_feat(self):
        cfg = dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=512, init_std=0.01, num_classes=4),
            module_cfg=dict(type='MVF', n_segment=2, alpha=0.25,
                            mode='THW', mvf_freq=(0, 0, 1, 1)),
        )
        model = build_recognizer(cfg, test_cfg=dict(average_clips=None))
        imgs = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), imgs, None,
                               return_loss=False, train=False)
        feats = model.apply(
            variables, imgs,
            method=lambda m, a: m.forward_extract_feat(a))
        # 2 clips of 2 frames -> per-frame pooled features
        assert feats.shape == (4, 512)

    def test_evaluate_dataset_extract_feat(self, tmp_path):
        import cv2
        from mvfnet_tpu.data import build_dataset
        from mvfnet_tpu.engine import evaluate_dataset
        from mvfnet_tpu.parallel import make_mesh
        root = tmp_path
        for v in range(2):
            d = root / f'v{v}'
            d.mkdir()
            for f in range(4):
                cv2.imwrite(str(d / f'img_{f + 1:05d}.jpg'),
                            np.zeros((32, 32, 3), np.uint8))
        (root / 'ann.txt').write_text('v0 4 0\nv1 4 1\n')
        ds = build_dataset(dict(
            type='RawFramesDataset', ann_file=str(root / 'ann.txt'),
            data_root=str(root), test_mode=True, modality='RGB',
            pipeline=[
                dict(type='SampleFrames', clip_len=2, frame_interval=1,
                     num_clips=1),
                dict(type='FrameSelector'),
                dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1]),
                dict(type='FormatShape', input_format='NHWC'),
                dict(type='Collect', keys=['img_group', 'label'],
                     meta_keys=[]),
            ]))
        cfg = dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=512, init_std=0.01, num_classes=4,
                          extract_feat=True),
            module_cfg=dict(type='MVF', n_segment=2, alpha=0.25,
                            mode='THW', mvf_freq=(0, 0, 1, 1)))
        model = build_recognizer(cfg, test_cfg=dict(average_clips=None))
        sample = ds[0]
        import jax
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(sample['img_group'])[None], None,
                               return_loss=False, train=False)
        feats = evaluate_dataset(model, variables, ds,
                                 mesh=make_mesh(jax.devices()[:1]),
                                 extract_feat=True)
        assert feats.shape == (2, 512)
