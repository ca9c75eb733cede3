"""VideoDataset end-to-end: real mp4 container through the decode pipeline,
frame-count probing, retry-on-failure."""

import os

import cv2
import numpy as np
import pytest

from mvfnet_tpu.data import build_dataset


@pytest.fixture(scope='module')
def video_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('videos')
    rng = np.random.RandomState(0)
    for v in range(2):
        path = str(root / f'vid{v}.mp4')
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 10.0,
                            (64, 48))
        for i in range(24):
            frame = np.full((48, 64, 3), (v * 50 + i * 5) % 255, np.uint8)
            w.write(frame)
        w.release()
    (root / 'broken.mp4').write_bytes(b'not a real container')
    (root / 'ann.txt').write_text('vid0.mp4 0\nvid1.mp4 1\n')
    (root / 'ann_with_broken.txt').write_text(
        'broken.mp4 0\nvid1.mp4 1\n')
    return root


def _pipeline(decoder='PyAVDecode', accurate=True, num_clips=1):
    dec = dict(type=decoder)
    if decoder == 'PyAVDecode':
        dec['accurate'] = accurate
    return [
        dict(type='SampleFrames', clip_len=4, frame_interval=2,
             num_clips=num_clips),
        dec,
        dict(type='Resize', scale=(float('inf'), 32), keep_ratio=True),
        dict(type='CenterCrop', crop_size=32),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='FormatShape', input_format='NHWC'),
        dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
    ]


class TestVideoDataset:
    @pytest.mark.parametrize('decoder', ['PyAVDecode', 'DecordDecode',
                                         'OpenCVDecode'])
    def test_decode_end_to_end(self, video_root, decoder):
        ds = build_dataset(dict(
            type='VideoDataset', ann_file=str(video_root / 'ann.txt'),
            data_root=str(video_root), pipeline=_pipeline(decoder),
            test_mode=True, modality='RGB'))
        s = ds[0]
        assert s['img_group'].shape == (4, 32, 32, 3)
        assert s['label'] == 0

    def test_frame_count_probe(self, video_root):
        """SampleFrames probes total_frames from the container when the
        annotation has none (loading.py:115-124)."""
        from mvfnet_tpu.data.video_io import probe_num_frames
        assert probe_num_frames(str(video_root / 'vid0.mp4')) == 24

    def test_retry_resamples_on_decode_failure(self, video_root):
        """A broken container triggers the random-resample retry
        (video_dataset.py:57-76) and eventually returns a good video."""
        ds = build_dataset(dict(
            type='VideoDataset',
            ann_file=str(video_root / 'ann_with_broken.txt'),
            data_root=str(video_root), pipeline=_pipeline(),
            test_mode=True, modality='RGB', num_retries=10))
        s = ds[0]  # index 0 is broken; retry must hand back vid1
        assert s['img_group'].shape == (4, 32, 32, 3)
        assert s['label'] == 1

    def test_accurate_vs_seek_same_frames(self, video_root):
        """For a clean container both decode modes return the same frames."""
        a = build_dataset(dict(
            type='VideoDataset', ann_file=str(video_root / 'ann.txt'),
            data_root=str(video_root),
            pipeline=_pipeline('PyAVDecode', accurate=True),
            test_mode=True, modality='RGB'))[1]
        b = build_dataset(dict(
            type='VideoDataset', ann_file=str(video_root / 'ann.txt'),
            data_root=str(video_root),
            pipeline=_pipeline('PyAVDecode', accurate=False),
            test_mode=True, modality='RGB'))[1]
        np.testing.assert_allclose(a['img_group'], b['img_group'],
                                   atol=2.0)
