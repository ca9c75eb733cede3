"""Data pipeline tests: sampling golden values, transforms, datasets,
sampler sharding, loader batching."""

import os

import cv2
import numpy as np
import pytest

from mvfnet_tpu.data import (Compose, DataLoader, ShardedSampler,
                             build_dataloader, build_dataset)
from mvfnet_tpu.data.sampling import SampleFrames
from mvfnet_tpu.data.transforms import (CenterCrop, Flip, FormatShape,
                                        Normalize, Resize, ThreeCrop,
                                        imrescale)


class TestSampleFrames:
    def test_test_mode_golden_dense(self):
        """Golden values for the K400 dense-test sampler: clip_len=8,
        interval=8, num_clips=10 on a 300-frame video
        (reference loading.py:62-70: offsets = int(tick/2 + tick*x))."""
        sf = SampleFrames(clip_len=8, frame_interval=8, num_clips=10)
        inds = sf.get_frame_inds(300, test_mode=True)
        tick = (300 - 64 + 1) / 10.0
        offsets = np.array([int(tick / 2 + tick * x) for x in range(10)])
        expect = (offsets[:, None] + np.arange(8) * 8).reshape(-1)
        expect = np.minimum(expect, 299)
        np.testing.assert_array_equal(inds, expect)
        assert inds.shape == (80,)

    def test_test_mode_short_video_clamps(self):
        sf = SampleFrames(clip_len=8, frame_interval=8, num_clips=10)
        inds = sf.get_frame_inds(20, test_mode=True)
        # tick <= 0 -> all offsets 0; indices clamped to 19
        assert inds.min() == 0
        assert inds.max() == 19
        np.testing.assert_array_equal(
            inds[:8], np.minimum(np.arange(8) * 8, 19))

    def test_train_mode_in_range_and_strided(self):
        rng = np.random.default_rng(0)
        sf = SampleFrames(clip_len=8, frame_interval=8, num_clips=1)
        for num_frames in [65, 100, 300, 1000]:
            inds = sf.get_frame_inds(num_frames, test_mode=False, rng=rng)
            assert inds.shape == (8,)
            assert inds.min() >= 0 and inds.max() < num_frames
            # constant stride 8 within the clip (no clamping for these sizes)
            np.testing.assert_array_equal(np.diff(inds), 8)

    def test_train_mode_short_video(self):
        rng = np.random.default_rng(0)
        sf = SampleFrames(clip_len=8, frame_interval=8, num_clips=1)
        inds = sf.get_frame_inds(10, test_mode=False, rng=rng)
        assert inds.shape == (8,)
        assert inds.max() <= 9

    def test_results_dict_contract(self):
        sf = SampleFrames(clip_len=4, frame_interval=2, num_clips=3)
        res = sf({'total_frames': 100, 'test_mode': True})
        assert res['frame_inds'].shape == (12,)
        assert res['num_clips'] == 3 and res['clip_len'] == 4


class TestTransforms:
    def _group(self, n=2, h=240, w=320):
        rng = np.random.RandomState(0)
        return {'img_group': [rng.randint(0, 255, (h, w, 3), np.uint8)
                              for _ in range(n)],
                'modality': 'RGB'}

    def test_resize_short_side(self):
        res = Resize(scale=(np.inf, 256), keep_ratio=True)(self._group())
        h, w = res['img_group'][0].shape[:2]
        assert h == 256 and w == 341  # int(320 * 256/240 + 0.5)

    def test_imrescale_rounding_matches_mmcv(self):
        img = np.zeros((240, 320, 3), np.uint8)
        out, factor = imrescale(img, (np.inf, 256))
        assert out.shape[:2] == (256, 341)
        assert factor == pytest.approx(256 / 240)

    def test_center_crop(self):
        res = CenterCrop(224)(self._group(h=256, w=341))
        assert res['img_group'][0].shape == (224, 224, 3)
        # box centered
        assert tuple(res['crop_bbox'][:2]) == ((341 - 224) // 2,
                                               (256 - 224) // 2)

    def test_three_crop_crop_major_order(self):
        """ThreeCrop emits [crop0 frames..., crop1..., crop2...]
        (augmentations.py:514-529)."""
        g = self._group(n=3, h=256, w=341)
        # tag each frame with a distinct value
        for i, img in enumerate(g['img_group']):
            img[:] = i
        res = ThreeCrop(256)(g)
        out = res['img_group']
        assert len(out) == 9
        vals = [int(img[0, 0, 0]) for img in out]
        assert vals == [0, 1, 2, 0, 1, 2, 0, 1, 2]
        assert all(img.shape == (256, 256, 3) for img in out)
        # left / right / middle offsets
        w_step = (341 - 256) // 2

    def test_flip_deterministic_with_rng(self):
        g = self._group()
        g['rng'] = np.random.default_rng(1)
        res = Flip(flip_ratio=1.0)(g)
        assert res['flip'] is True
        g2 = self._group()
        g2['rng'] = np.random.default_rng(1)
        res2 = Flip(flip_ratio=0.0)(g2)
        assert res2['flip'] is False

    def test_normalize_bgr_to_rgb(self):
        g = self._group(n=1)
        src = g['img_group'][0].astype(np.float32)
        mean = [123.675, 116.28, 103.53]
        std = [58.395, 57.12, 57.375]
        res = Normalize(mean=mean, std=std, to_rgb=True)(g)
        out = res['img_group'][0]
        expect = (src[..., ::-1] - np.array(mean, np.float32)) / np.array(
            std, np.float32)
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_format_shape_nhwc(self):
        g = self._group(n=8, h=224, w=224)
        g.update(num_clips=2, clip_len=4)
        res = FormatShape('NHWC')(g)
        assert res['img_group'].shape == (8, 224, 224, 3)

    def test_format_shape_ncthw_matches_reference_transpose(self):
        g = self._group(n=8, h=32, w=32)
        g.update(num_clips=2, clip_len=4)
        stacked = np.stack([im.transpose(2, 0, 1) for im in g['img_group']])
        expect = stacked.reshape(-1, 2, 4, 3, 32, 32).transpose(
            0, 1, 3, 2, 4, 5).reshape(-1, 3, 4, 32, 32)
        res = FormatShape('NCTHW')(g)
        np.testing.assert_array_equal(res['img_group'], expect)


@pytest.fixture(scope='module')
def rawframes_root(tmp_path_factory):
    """Synthetic rawframes dataset: 4 videos x 40 frames of 64x80 JPEG."""
    root = tmp_path_factory.mktemp('rawframes')
    rng = np.random.RandomState(7)
    lines = []
    for v in range(4):
        vdir = root / f'vid{v}'
        vdir.mkdir()
        for f in range(40):
            img = rng.randint(0, 255, (64, 80, 3), np.uint8)
            cv2.imwrite(str(vdir / f'img_{f + 1:05}.jpg'), img)
        lines.append(f'vid{v} 40 {v % 2}')
    ann = root / 'ann.txt'
    ann.write_text('\n'.join(lines) + '\n')
    return root, ann


def _train_pipeline(clip_len=4):
    return [
        dict(type='SampleFrames', clip_len=clip_len, frame_interval=2,
             num_clips=1),
        dict(type='FrameSelector'),
        dict(type='RandomResizedCrop', input_size=32),
        dict(type='Flip', flip_ratio=0.5),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='FormatShape', input_format='NHWC'),
        dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
    ]


class TestDatasetEndToEnd:
    def test_rawframes_train_sample(self, rawframes_root):
        root, ann = rawframes_root
        ds = build_dataset(dict(
            type='RawFramesDataset', ann_file=str(ann), data_root=str(root),
            pipeline=_train_pipeline(), test_mode=False, modality='RGB'))
        assert len(ds) == 4
        s = ds[0]
        assert s['img_group'].shape == (4, 32, 32, 3)
        assert s['img_group'].dtype == np.float32
        assert s['label'] == 0

    def test_determinism_per_epoch(self, rawframes_root):
        root, ann = rawframes_root
        ds = build_dataset(dict(
            type='RawFramesDataset', ann_file=str(ann), data_root=str(root),
            pipeline=_train_pipeline(), test_mode=False, modality='RGB'))
        a = ds[1]['img_group']
        b = ds[1]['img_group']
        np.testing.assert_array_equal(a, b)  # same epoch -> same aug
        ds.set_epoch(1)
        c = ds[1]['img_group']
        assert not np.array_equal(a, c)  # new epoch -> new aug

    def test_dense_test_pipeline(self, rawframes_root):
        root, ann = rawframes_root
        pipeline = [
            dict(type='SampleFrames', clip_len=4, frame_interval=2,
                 num_clips=3),
            dict(type='FrameSelector'),
            dict(type='Resize', scale=(np.inf, 64), keep_ratio=True),
            dict(type='ThreeCrop', crop_size=64),
            dict(type='Flip', flip_ratio=0),
            dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_rgb=True),
            dict(type='FormatShape', input_format='NHWC'),
            dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
        ]
        ds = build_dataset(dict(
            type='RawFramesDataset', ann_file=str(ann), data_root=str(root),
            pipeline=pipeline, test_mode=True, modality='RGB'))
        s = ds[0]
        # 3 crops x 3 clips x 4 frames = 36
        assert s['img_group'].shape == (36, 64, 64, 3)

    def test_loader_batching(self, rawframes_root):
        root, ann = rawframes_root
        ds = build_dataset(dict(
            type='RawFramesDataset', ann_file=str(ann), data_root=str(root),
            pipeline=_train_pipeline(), test_mode=False, modality='RGB'))
        loader = build_dataloader(ds, videos_per_gpu=2, workers_per_gpu=2,
                                  dist=False, shuffle=True,
                                  world_size=1, rank=0)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]['img_group'].shape == (2, 4, 32, 32, 3)
        assert batches[0]['label'].shape == (2,)


class TestShardedSampler:
    def test_disjoint_cover(self):
        n, ws = 10, 4
        shards = [ShardedSampler(n, ws, r, shuffle=True, seed=3)
                  for r in range(ws)]
        all_inds = sum((s.local_indices() for s in shards), [])
        assert len(all_inds) == 12  # padded to 12
        assert set(all_inds) == set(range(10))
        # equal shard sizes
        assert all(len(s.local_indices()) == 3 for s in shards)

    def test_epoch_reshuffles(self):
        s = ShardedSampler(100, 1, 0, shuffle=True, seed=0)
        a = s.local_indices()
        s.set_epoch(1)
        b = s.local_indices()
        assert a != b
        assert sorted(a) == sorted(b)

    def test_no_shuffle_is_identity_order(self):
        s = ShardedSampler(6, 2, 1, shuffle=False)
        assert s.local_indices() == [1, 3, 5]


class TestGroupSampler:
    def test_flag_homogeneous_batches(self):
        from mvfnet_tpu.data.sampler import GroupSampler
        flags = np.array([0, 1, 0, 1, 0, 1, 0])
        s = GroupSampler(flags, samples_per_batch=2, seed=1)
        idx = s.local_indices()
        assert len(idx) == len(s)  # padded to batch multiples
        for i in range(0, len(idx), 2):
            batch_flags = flags[idx[i:i + 2]]
            assert len(set(batch_flags)) == 1

    def test_distributed_group_sampler_covers(self):
        from mvfnet_tpu.data.sampler import DistributedGroupSampler
        flags = np.array([0] * 6 + [1] * 6)
        shards = [DistributedGroupSampler(flags, 2, world_size=2, rank=r,
                                          seed=0) for r in range(2)]
        all_idx = shards[0].local_indices() + shards[1].local_indices()
        assert set(all_idx) == set(range(12))
        assert len(shards[0].local_indices()) == len(
            shards[1].local_indices())


class TestPklDataset:
    def test_end_to_end(self, rawframes_root, tmp_path):
        """Frames packed as pickled JPEG-bytes lists -> PklLoader decode
        (reference pkl_dataset.py + loading.py:375-414)."""
        import pickle
        root, ann = rawframes_root
        pkl_root = tmp_path / 'pkl'
        lines = []
        for line in ann.read_text().strip().split('\n'):
            d, n, label = line.split()
            blobs = []
            for i in range(int(n)):
                with open(root / d / f'img_{i + 1:05d}.jpg', 'rb') as f:
                    blobs.append(f.read())
            (pkl_root / d).parent.mkdir(parents=True, exist_ok=True)
            with open(pkl_root / f'{d}.pkl', 'wb') as f:
                pickle.dump(blobs, f)
            lines.append(f'{d}.pkl {n} {label}')
        pkl_ann = tmp_path / 'ann_pkl.txt'
        pkl_ann.write_text('\n'.join(lines) + '\n')
        ds = build_dataset(dict(
            type='PklDataset', ann_file=str(pkl_ann),
            data_root=str(pkl_root), test_mode=True, modality='RGB',
            pipeline=[
                dict(type='SampleFrames', clip_len=4, frame_interval=2,
                     num_clips=1),
                dict(type='PklLoader'),
                dict(type='FormatShape', input_format='NHWC'),
                dict(type='Collect', keys=['img_group', 'label'],
                     meta_keys=[]),
            ]))
        s = ds[0]
        assert s['img_group'].shape == (4, 64, 80, 3)
        assert s['label'] == 0


class TestSthSamplingVariants:
    def test_sth_samples_2_doubles_offsets(self):
        """sth_samples=2: centered offsets + left-aligned offsets
        (loading.py:71-74)."""
        sf = SampleFrames(clip_len=4, frame_interval=2, num_clips=3,
                          sth_samples=2)
        inds = sf.get_frame_inds(100, test_mode=True)
        assert inds.shape == (2 * 3 * 4,)
        tick = (100 - 8 + 1) / 3.0
        centered = [int(tick / 2 + tick * x) for x in range(3)]
        left = [int(tick * x) for x in range(3)]
        expect_offsets = centered + left
        got_offsets = inds.reshape(6, 4)[:, 0]
        np.testing.assert_array_equal(got_offsets, expect_offsets)

    def test_sth_samples_10_uses_train_sampler(self):
        """sth_samples=10: ten random train-style draws (loading.py:75-79)."""
        rng = np.random.default_rng(0)
        sf = SampleFrames(clip_len=4, frame_interval=2, num_clips=3,
                          sth_samples=10)
        inds = sf.get_frame_inds(100, test_mode=True, rng=rng)
        assert inds.shape == (10 * 3 * 4,)
        assert inds.min() >= 0 and inds.max() < 100

    def test_temporal_jitter(self):
        """Jitter adds the same per-frame offset to every clip
        (loading.py:102-107)."""
        rng = np.random.default_rng(1)
        sf = SampleFrames(clip_len=4, frame_interval=4, num_clips=2,
                          temporal_jitter=True)
        inds = sf.get_frame_inds(200, test_mode=True, rng=rng).reshape(2, 4)
        base = SampleFrames(clip_len=4, frame_interval=4, num_clips=2
                            ).get_frame_inds(200, test_mode=True).reshape(2, 4)
        jitter = inds - base
        # same jitter vector applied to both clips, within [0, interval)
        np.testing.assert_array_equal(jitter[0], jitter[1])
        assert (jitter >= 0).all() and (jitter < 4).all()
