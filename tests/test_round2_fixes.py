"""Round-2 correctness-edge fixes.

Covers: RepeatDataset per-epoch reseeding forwarding, FileClient wiring in
FrameSelector (reference ``loading.py:425-431``), TRN per-forward random
subset sampling (reference ``relation_consensus.py:80-92``), and the
empty-shard guard in evaluate_dataset.
"""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def rawframes_root(tmp_path):
    rng = np.random.default_rng(0)
    for v in range(3):
        d = tmp_path / f'v{v}'
        d.mkdir()
        for f in range(8):
            img = rng.integers(0, 255, (48, 64, 3), np.uint8)
            cv2.imwrite(str(d / f'img_{f + 1:05d}.jpg'), img)
    (tmp_path / 'ann.txt').write_text('v0 8 0\nv1 8 1\nv2 8 2\n')
    return tmp_path


TRAIN_PIPELINE = [
    dict(type='SampleFrames', clip_len=2, frame_interval=1, num_clips=1),
    dict(type='FrameSelector'),
    dict(type='RandomResizedCrop', input_size=32),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1]),
    dict(type='FormatShape', input_format='NHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]


class TestRepeatDatasetSetEpoch:
    def test_set_epoch_forwards_and_redraws_augmentations(self,
                                                          rawframes_root):
        from mvfnet_tpu.data import build_dataset
        ds = build_dataset(dict(
            type='RepeatDataset', times=3,
            dataset=dict(type='RawFramesDataset',
                         ann_file=str(rawframes_root / 'ann.txt'),
                         data_root=str(rawframes_root),
                         pipeline=TRAIN_PIPELINE)))
        assert len(ds) == 9
        ds.set_epoch(0)
        a0 = ds[0]['img_group']
        ds.set_epoch(0)
        b0 = ds[0]['img_group']
        np.testing.assert_array_equal(a0, b0)  # same epoch -> same draws
        ds.set_epoch(1)
        a1 = ds[0]['img_group']
        assert not np.array_equal(a0, a1)  # new epoch -> new draws

    def test_loader_set_epoch_reaches_repeated_dataset(self, rawframes_root):
        from mvfnet_tpu.data import DataLoader, build_dataset
        ds = build_dataset(dict(
            type='RepeatDataset', times=2,
            dataset=dict(type='RawFramesDataset',
                         ann_file=str(rawframes_root / 'ann.txt'),
                         data_root=str(rawframes_root),
                         pipeline=TRAIN_PIPELINE)))
        loader = DataLoader(ds, batch_size=3, num_workers=1)
        loader.set_epoch(5)
        assert ds.dataset.epoch == 5


class TestFrameSelectorFileClient:
    def test_nondisk_backend_serves_frames(self, rawframes_root):
        from mvfnet_tpu.utils.file_client import (BaseStorageBackend,
                                                  FileClient)

        store = {}
        for v in range(3):
            for f in range(8):
                p = str(rawframes_root / f'v{v}' / f'img_{f + 1:05d}.jpg')
                with open(p, 'rb') as fh:
                    store[p] = fh.read()

        calls = []

        class FakeBackend(BaseStorageBackend):
            def __init__(self, **kwargs):
                pass

            def get(self, filepath):
                calls.append(filepath)
                return store[filepath]

        FileClient.register_backend('fake', FakeBackend)
        from mvfnet_tpu.data.loading import FrameSelector
        sel = FrameSelector(io_backend='fake')
        results = dict(filename=str(rawframes_root / 'v0'),
                       filename_tmpl='img_{:05d}.jpg',
                       frame_inds=np.array([0, 1, 2]), modality='RGB')
        out = sel(results)
        assert len(calls) == 3  # every frame went through the backend
        assert len(out['img_group']) == 3
        disk = FrameSelector(io_backend='disk')
        ref = disk(dict(filename=str(rawframes_root / 'v0'),
                        filename_tmpl='img_{:05d}.jpg',
                        frame_inds=np.array([0, 1, 2]), modality='RGB'))
        np.testing.assert_array_equal(np.stack(out['img_group']),
                                      np.stack(ref['img_group']))

    def test_nondisk_backend_corrupt_falls_back_to_backup(self):
        from mvfnet_tpu.utils.file_client import (BaseStorageBackend,
                                                  FileClient)
        good = cv2.imencode('.jpg', np.zeros((8, 8, 3), np.uint8))[1].tobytes()

        class HalfBroken(BaseStorageBackend):
            def __init__(self, **kwargs):
                pass

            def get(self, filepath):
                if '00002' in filepath:
                    return b'not a jpeg'
                return good

        FileClient.register_backend('halfbroken', HalfBroken)
        from mvfnet_tpu.data.loading import FrameSelector
        sel = FrameSelector(io_backend='halfbroken')
        out = sel(dict(filename='/x', filename_tmpl='img_{:05d}.jpg',
                       frame_inds=np.array([0, 1]), modality='RGB'))
        assert len(out['img_group']) == 2  # frame 2 fell back to backup


class TestTRNRandomSubsets:
    def _trn(self):
        from mvfnet_tpu.models.heads.consensus import RelationModuleMultiScale
        return RelationModuleMultiScale(img_feature_dim=16, num_frames=5,
                                        num_classes=3)

    def test_stochastic_with_rng_deterministic_without(self):
        trn = self._trn()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
        variables = trn.init(jax.random.PRNGKey(1), x)
        # no 'subsets' rng -> deterministic
        a = trn.apply(variables, x)
        b = trn.apply(variables, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # same rng -> same subsets; different rng -> (almost surely) different
        r1 = trn.apply(variables, x, rngs={'subsets': jax.random.PRNGKey(7)})
        r2 = trn.apply(variables, x, rngs={'subsets': jax.random.PRNGKey(7)})
        r3 = trn.apply(variables, x, rngs={'subsets': jax.random.PRNGKey(8)})
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        assert not np.array_equal(np.asarray(r1), np.asarray(r3))

    def test_subset_counts_match_reference(self):
        # scales [5,4,3,2]: C(5,s) = 1,5,10,10 combos; reference draws
        # min(3, n) for every scale past the first, exactly 1 for the first
        from mvfnet_tpu.models.heads.consensus import (_all_relation_subsets,
                                                       _deterministic_pick)
        assert len(_all_relation_subsets(5, 5)) == 1
        assert len(_all_relation_subsets(5, 4)) == 5
        assert len(_deterministic_pick(5, 3)) == 3
        assert len(_deterministic_pick(2, 3)) == 2


class TestEvalEmptyShardGuard:
    def test_empty_dataset_returns_empty(self, tmp_path):
        from mvfnet_tpu.data import build_dataset
        from mvfnet_tpu.engine import evaluate_dataset
        from mvfnet_tpu.models import build_recognizer
        from mvfnet_tpu.parallel import make_mesh
        (tmp_path / 'ann.txt').write_text('')
        ds = build_dataset(dict(
            type='RawFramesDataset', ann_file=str(tmp_path / 'ann.txt'),
            data_root=str(tmp_path), test_mode=True,
            pipeline=[dict(type='SampleFrames', clip_len=2, frame_interval=1,
                           num_clips=1),
                      dict(type='FrameSelector'),
                      dict(type='FormatShape', input_format='NHWC'),
                      dict(type='Collect', keys=['img_group', 'label'],
                           meta_keys=[])]))
        cfg = dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=512, init_std=0.01, num_classes=4))
        model = build_recognizer(cfg, test_cfg=dict(average_clips=None))
        imgs = jnp.zeros((1, 2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), imgs, None,
                               return_loss=False, train=False)
        scores = evaluate_dataset(model, variables, ds,
                                  mesh=make_mesh(jax.devices()[:1]))
        assert scores.shape[0] == 0
