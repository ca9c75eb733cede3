"""Composed file->score parity: the whole dense-test chain vs the EXECUTING
reference.

Every stage is already pinned in isolation (sampling, frame loading,
transforms, model forward, clip averaging); this module asserts the
COMPOSITION: real JPEG rawframes on disk -> annotation parsing -> the
reference's own ``RawFramesDataset`` + ``Compose`` pipeline + R50+MVF
``forward_test`` + ``average_clip`` vs our dataset/pipeline/recognizer on
imported f64 weights. Deterministic end to end (test-mode sampling,
ThreeCrop, flip_ratio=0), so the scores must agree to f64 round-off.

Reference chain: ``codes/datasets/rawframes_dataset.py:40-69`` ->
``codes/datasets/pipelines/*`` ->
``codes/models/recognizers/recognizer2d.py:150-179`` ->
``codes/models/recognizers/base.py`` ``average_clip``.
"""

import os
import os.path as osp

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mvfnet_tpu.data.builder import build_dataset
from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.utils.checkpoint import import_torch_weights

from reference_loader import load_reference, load_reference_pipelines

NUM_CLASSES = 8
CLIP_LEN = 4          # MVF n_segment
FRAME_INTERVAL = 2
NUM_CLIPS = 2
CROP = 64
MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


@pytest.fixture(scope='module')
def f64():
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', False)


@pytest.fixture(scope='module')
def tree(tmp_path_factory):
    """Two rawframes clips (30 frames, 80x100) + annotation file."""
    import cv2
    root = tmp_path_factory.mktemp('rawframes')
    rng = np.random.RandomState(11)
    lines = []
    for vid, label in (('clip_a', 3), ('clip_b', 5)):
        d = root / vid
        os.makedirs(d)
        for i in range(1, 31):
            img = rng.randint(0, 255, size=(80, 100, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f'img_{i:05}.jpg'), img)
        lines.append(f'{vid} 30 {label}')
    ann = root / 'ann.txt'
    ann.write_text('\n'.join(lines) + '\n')
    return str(root), str(ann)


def _ref_pipeline():
    return [
        dict(type='SampleFrames', clip_len=CLIP_LEN,
             frame_interval=FRAME_INTERVAL, num_clips=NUM_CLIPS),
        dict(type='FrameSelector'),
        dict(type='Resize', scale=(np.inf, 72), keep_ratio=True),
        dict(type='ThreeCrop', crop_size=CROP),
        dict(type='Flip', flip_ratio=0),
        dict(type='Normalize', mean=MEAN, std=STD, div_255=False,
             to_rgb=True),
        dict(type='FormatShape', input_format='NCHW'),
        dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
    ]


def _our_pipeline():
    return [
        dict(type='SampleFrames', clip_len=CLIP_LEN,
             frame_interval=FRAME_INTERVAL, num_clips=NUM_CLIPS),
        dict(type='FrameSelector'),
        dict(type='Resize', scale=(float('inf'), 72), keep_ratio=True),
        dict(type='ThreeCrop', crop_size=CROP),
        dict(type='Flip', flip_ratio=0),
        dict(type='Normalize', mean=MEAN, std=STD, div_255=False,
             to_rgb=True),
        dict(type='FormatShape', input_format='NHWC'),
        dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
    ]


@pytest.fixture(scope='module')
def datasets(tree):
    root, ann = tree
    pipe = load_reference_pipelines()
    ref_ds = pipe.RawFramesDataset(ann_file=ann, pipeline=_ref_pipeline(),
                                   data_root=root, test_mode=True,
                                   filename_tmpl='img_{:05}.jpg',
                                   modality='RGB')
    our_ds = build_dataset(dict(type='RawFramesDataset', ann_file=ann,
                                pipeline=_our_pipeline(), data_root=root,
                                test_mode=True,
                                filename_tmpl='img_{:05}.jpg',
                                modality='RGB'))
    return ref_ds, our_ds


class TestPipelineComposition:

    def test_batches_bit_equal(self, datasets):
        ref_ds, our_ds = datasets
        assert len(ref_ds) == len(our_ds) == 2
        for i in range(2):
            ref_item = ref_ds[i]
            our_item = our_ds[i]
            assert int(ref_item['label']) == int(our_item['label'])
            ref_imgs = np.asarray(ref_item['img_group'])  # (S, C, H, W)
            our_imgs = np.asarray(our_item['img_group'])  # (S, H, W, C)
            assert ref_imgs.shape == (NUM_CLIPS * 3 * CLIP_LEN, 3, CROP,
                                      CROP)
            np.testing.assert_array_equal(our_imgs.transpose(0, 3, 1, 2),
                                          ref_imgs)


class TestFileToScore:

    def test_dense_scores_match(self, f64, datasets):
        ref = load_reference()
        ref_ds, our_ds = datasets

        torch.manual_seed(21)
        ref_model = ref.build_recognizer(
            dict(type='Recognizer2D',
                 backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                               norm_eval=False,
                               norm_cfg=dict(type='BN', requires_grad=True)),
                 cls_head=dict(type='TSNClsHead', spatial_size=-1,
                               spatial_type='avg', dropout_ratio=0.0,
                               in_channels=2048, init_std=0.01,
                               num_classes=NUM_CLASSES),
                 module_cfg=dict(type='MVF', n_segment=CLIP_LEN,
                                 alpha=0.125, mvf_freq=(0, 0, 1, 1),
                                 mode='THW')),
            train_cfg=None, test_cfg=dict(average_clips='score'))
        with torch.no_grad():
            for m in ref_model.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
        ref_model = ref_model.double().eval()

        model = build_recognizer(
            dict(type='Recognizer2D',
                 backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                               norm_eval=False,
                               norm_cfg=dict(type='BN', requires_grad=True)),
                 cls_head=dict(type='TSNClsHead', spatial_size=-1,
                               spatial_type='avg', dropout_ratio=0.0,
                               in_channels=2048, init_std=0.01,
                               num_classes=NUM_CLASSES),
                 module_cfg=dict(type='MVF', n_segment=CLIP_LEN,
                                 alpha=0.125, mvf_freq=(0, 0, 1, 1),
                                 mode='THW'),
                 dtype=None),
            test_cfg=dict(average_clips='score'))
        variables = model.init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(1)},
            jnp.zeros((1, CLIP_LEN, CROP, CROP, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32), return_loss=True, train=True)
        variables = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), variables)
        sd = {k: v.detach().numpy()
              for k, v in ref_model.state_dict().items()}
        variables = import_torch_weights(sd, variables)

        for i in range(2):
            ref_item = ref_ds[i]
            our_item = our_ds[i]
            ref_in = torch.from_numpy(
                np.asarray(ref_item['img_group'],
                           dtype=np.float64))[None]    # (1, S, C, H, W)
            with torch.no_grad():
                ref_scores = ref_model(img_group=ref_in, label=None,
                                       return_loss=False,
                                       return_numpy=True)
            assert ref_scores.shape == (1, NUM_CLASSES)

            our_in = jnp.asarray(
                np.asarray(our_item['img_group'],
                           dtype=np.float64))[None]    # (1, S, H, W, C)
            ours = model.apply(variables, our_in, None, return_loss=False)
            np.testing.assert_allclose(np.asarray(ours), ref_scores,
                                       rtol=1e-9, atol=1e-12)
