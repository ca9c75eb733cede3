"""SampleFrames + FrameSelector pinned against the EXECUTING reference.

``mvfnet_tpu/data/sampling.py`` is a disclosed functional port of the
reference's index math (``codes/datasets/pipelines/loading.py:11-131``),
previously validated only by golden values.  Here the reference bytes
themselves execute as the oracle:

- test-mode offsets are deterministic -> compared directly across a
  geometry grid covering every branch (tick>0, tick<=0, sth_samples 1/2)
- train-mode and the random sth paths draw from the legacy MT19937
  stream: the reference uses the module-global ``np.random`` (seeded),
  ours takes an injected generator — a ``RandomState`` wrapper seeded
  identically consumes the exact same draw sequence, so indices must be
  bit-equal
- FrameSelector loads real JPEG frames (RGB 1-based templates, Flow x/y
  pairs) through both implementations and compares pixels
"""

import os
import os.path as osp

import numpy as np
import pytest

from mvfnet_tpu.data.loading import FrameSelector as OurFrameSelector
from mvfnet_tpu.data.sampling import SampleFrames as OurSampleFrames

from reference_loader import load_reference_pipelines


@pytest.fixture(scope='module')
def pipe():
    return load_reference_pipelines()


class LegacyRNG:
    """``np.random.Generator``-shaped facade over a ``RandomState``.

    ``np.random.seed(s)`` seeds the global legacy RandomState the
    reference draws from; ``RandomState(s)`` replays the identical
    MT19937 stream as long as the call sequence matches (it does: our
    port makes the same randint calls in the same order).
    """

    def __init__(self, seed):
        self.rs = np.random.RandomState(seed)

    def integers(self, low, high, size=None):
        assert low == 0
        return self.rs.randint(high, size=size)


GEOMETRIES = [
    # (clip_len, frame_interval, num_clips, total_frames)
    (8, 8, 1, 300),     # K400 train 8x8
    (8, 8, 10, 300),    # dense test
    (4, 16, 1, 250),    # 4x16
    (16, 4, 10, 280),   # 16x4
    (8, 8, 10, 60),     # avg_interval == 0, num_frames < ori_clip_len
    (8, 8, 10, 70),     # avg_interval == 0, middle branch
    (8, 1, 8, 40),      # sth-style segments
    (8, 1, 8, 7),       # fewer frames than clip
    (1, 1, 3, 3),       # degenerate
]


class TestSampleFramesTestMode:

    @pytest.mark.parametrize('cl,fi,nc,tf', GEOMETRIES)
    def test_deterministic_offsets(self, pipe, cl, fi, nc, tf):
        ref = pipe.SampleFrames(clip_len=cl, frame_interval=fi, num_clips=nc)
        ours = OurSampleFrames(clip_len=cl, frame_interval=fi, num_clips=nc)
        ref_out = ref({'total_frames': tf, 'test_mode': True})
        got = ours.get_frame_inds(tf, test_mode=True)
        np.testing.assert_array_equal(got, ref_out['frame_inds'])
        assert got.dtype == np.int64

    def test_sth_twice_sample(self, pipe):
        ref = pipe.SampleFrames(clip_len=1, num_clips=16, sth_samples=2)
        ours = OurSampleFrames(clip_len=1, num_clips=16, sth_samples=2)
        ref_out = ref({'total_frames': 47, 'test_mode': True})
        np.testing.assert_array_equal(ours.get_frame_inds(47, True),
                                      ref_out['frame_inds'])


class TestSampleFramesRandomPaths:

    @pytest.mark.parametrize('cl,fi,nc,tf', GEOMETRIES)
    def test_train_mode_shared_stream(self, pipe, cl, fi, nc, tf):
        ref = pipe.SampleFrames(clip_len=cl, frame_interval=fi, num_clips=nc)
        ours = OurSampleFrames(clip_len=cl, frame_interval=fi, num_clips=nc)
        for trial in range(5):
            seed = 1000 + 13 * trial
            np.random.seed(seed)
            ref_out = ref({'total_frames': tf, 'test_mode': False})
            got = ours.get_frame_inds(tf, test_mode=False,
                                      rng=LegacyRNG(seed))
            np.testing.assert_array_equal(got, ref_out['frame_inds'])

    def test_temporal_jitter(self, pipe):
        ref = pipe.SampleFrames(clip_len=8, frame_interval=8, num_clips=1,
                                temporal_jitter=True)
        ours = OurSampleFrames(clip_len=8, frame_interval=8, num_clips=1,
                               temporal_jitter=True)
        for seed in (7, 8, 9):
            np.random.seed(seed)
            ref_out = ref({'total_frames': 120, 'test_mode': False})
            got = ours.get_frame_inds(120, False, rng=LegacyRNG(seed))
            np.testing.assert_array_equal(got, ref_out['frame_inds'])

    def test_sth_samples_10(self, pipe):
        ref = pipe.SampleFrames(clip_len=1, num_clips=8, sth_samples=10)
        ours = OurSampleFrames(clip_len=1, num_clips=8, sth_samples=10)
        np.random.seed(99)
        ref_out = ref({'total_frames': 53, 'test_mode': True})
        got = ours.get_frame_inds(53, True, rng=LegacyRNG(99))
        np.testing.assert_array_equal(got, ref_out['frame_inds'])

    def test_sth_samples_generic_random(self, pipe):
        # sth_samples not in {1,2,10}: center offsets + (n-1) random rows
        ref = pipe.SampleFrames(clip_len=1, num_clips=8, sth_samples=4)
        ours = OurSampleFrames(clip_len=1, num_clips=8, sth_samples=4)
        np.random.seed(123)
        ref_out = ref({'total_frames': 61, 'test_mode': True})
        got = ours.get_frame_inds(61, True, rng=LegacyRNG(123))
        np.testing.assert_array_equal(got, ref_out['frame_inds'])


# ---------------------------------------------------------------------------
# FrameSelector
# ---------------------------------------------------------------------------

def _write_frames(root, n, flow=False):
    import cv2
    rng = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    for i in range(1, n + 1):
        img = rng.randint(0, 255, size=(32, 40, 3), dtype=np.uint8)
        if flow:
            cv2.imwrite(osp.join(root, f'x_{i:05d}.jpg'), img[:, :, 0])
            cv2.imwrite(osp.join(root, f'y_{i:05d}.jpg'), img[:, :, 1])
        else:
            cv2.imwrite(osp.join(root, f'img_{i:05d}.jpg'), img)


class TestFrameSelectorVsReference:

    def test_rgb_pixels_equal(self, pipe, tmp_path):
        d = str(tmp_path / 'clip')
        _write_frames(d, 6)
        inds = np.array([0, 2, 2, 5])
        base = dict(filename=d, filename_tmpl='img_{:05d}.jpg',
                    frame_inds=inds, modality='RGB')
        ref_out = pipe.FrameSelector()(dict(base))
        our_out = OurFrameSelector(use_native=False)(dict(base))
        assert ref_out['ori_shape'] == our_out['ori_shape']
        ref_imgs = np.stack(ref_out['img_group'])
        our_imgs = np.stack(our_out['img_group'])
        np.testing.assert_array_equal(our_imgs, ref_imgs)

    def test_rgb_native_pixels_equal(self, pipe, tmp_path):
        sel = OurFrameSelector(use_native=True)
        if sel._native is None:
            pytest.skip('native decoder not built')
        d = str(tmp_path / 'clip')
        _write_frames(d, 4)
        base = dict(filename=d, filename_tmpl='img_{:05d}.jpg',
                    frame_inds=np.array([0, 1, 3]), modality='RGB')
        ref_out = pipe.FrameSelector()(dict(base))
        our_out = sel(dict(base))
        np.testing.assert_array_equal(np.stack(our_out['img_group']),
                                      np.stack(ref_out['img_group']))

    def test_flow_pairs_equal(self, pipe, tmp_path):
        d = str(tmp_path / 'flow')
        _write_frames(d, 5, flow=True)
        base = dict(filename=d, filename_tmpl='{}_{:05d}.jpg',
                    frame_inds=np.array([0, 3]), modality='Flow')
        ref_out = pipe.FrameSelector()(dict(base))
        our_out = OurFrameSelector(use_native=False)(dict(base))
        assert len(ref_out['img_group']) == len(our_out['img_group']) == 4
        for a, b in zip(our_out['img_group'], ref_out['img_group']):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
