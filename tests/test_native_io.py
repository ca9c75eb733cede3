"""Native JPEG decoder vs cv2: decoded pixels must match (both are libjpeg
family decoders; baseline JPEG decode is deterministic)."""

import os
import subprocess

import cv2
import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', 'native')
LIB = os.path.join(NATIVE_DIR, 'build', 'libmvf_native.so')


@pytest.fixture(scope='module', autouse=True)
def built_lib():
    if not os.path.exists(LIB):
        subprocess.run(['make', '-C', NATIVE_DIR], check=True,
                       capture_output=True)
    assert os.path.exists(LIB)


@pytest.fixture(scope='module')
def jpegs(tmp_path_factory):
    root = tmp_path_factory.mktemp('jpegs')
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(64, 80), (128, 96), (37, 53)]):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        # smooth it so JPEG is closer to lossless-ish and decoders agree
        img = cv2.GaussianBlur(img, (5, 5), 2)
        p = str(root / f'im{i}.jpg')
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


class TestNativeDecoder:
    def test_probe(self, jpegs):
        from mvfnet_tpu.data.native_io import NativeImageLoader
        loader = NativeImageLoader()
        assert loader.probe(jpegs[0]) == (64, 80, 3)
        assert loader.probe('/nonexistent.jpg') is None

    def test_decode_matches_cv2(self, jpegs):
        from mvfnet_tpu.data.native_io import NativeImageLoader
        loader = NativeImageLoader()
        for p in jpegs:
            ours = loader.load(p)
            ref = cv2.imread(p, cv2.IMREAD_COLOR)
            assert ours.shape == ref.shape
            # identical libjpeg-family decode; allow off-by-one from
            # different fancy-upsampling defaults
            diff = np.abs(ours.astype(int) - ref.astype(int))
            assert diff.max() <= 1, diff.max()
            assert (diff > 0).mean() < 0.01

    def test_batch_decode(self, jpegs):
        from mvfnet_tpu.data.native_io import NativeImageLoader
        loader = NativeImageLoader(num_threads=3)
        out = loader.load_batch(jpegs * 3)
        assert out is not None and len(out) == 9
        ref = cv2.imread(jpegs[1], cv2.IMREAD_COLOR)
        diff = np.abs(out[1].astype(int) - ref.astype(int))
        assert diff.max() <= 1

    def test_corrupt_file_returns_none(self, jpegs, tmp_path):
        from mvfnet_tpu.data.native_io import NativeImageLoader
        bad = tmp_path / 'bad.jpg'
        bad.write_bytes(b'\xff\xd8\xff\xe0 garbage not a jpeg')
        loader = NativeImageLoader()
        assert loader.load(str(bad)) is None

    def test_frameselector_uses_native(self, jpegs, tmp_path):
        """FrameSelector with use_native=True produces the same frames as
        the cv2 fallback."""
        import shutil
        from mvfnet_tpu.data.loading import FrameSelector
        d = tmp_path / 'vid'
        d.mkdir()
        for i, p in enumerate(jpegs):
            shutil.copy(p, d / f'img_{i + 1:05}.jpg')
        results = dict(filename=str(d), filename_tmpl='img_{:05}.jpg',
                       frame_inds=np.array([0, 1, 2]), modality='RGB')
        native = FrameSelector(use_native=True)(dict(results))
        fallback = FrameSelector(use_native=False)(dict(results))
        assert native is not None and fallback is not None
        for a, b in zip(native['img_group'], fallback['img_group']):
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


@pytest.fixture(scope='module')
def test_video(tmp_path_factory):
    root = tmp_path_factory.mktemp('nvideo')
    path = str(root / 'clip.mp4')
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 10.0,
                        (64, 48))
    rng = np.random.RandomState(0)
    base = rng.randint(0, 200, (48, 64, 3), np.uint8)
    for i in range(25):
        frame = np.clip(base.astype(int) + i * 8, 0, 255).astype(np.uint8)
        w.write(frame)
    w.release()
    return path


class TestNativeVideoDecoder:
    def test_probe(self, test_video):
        from mvfnet_tpu.data.native_io import NativeVideoDecoder
        dec = NativeVideoDecoder()
        n, h, w = dec.probe(test_video)
        assert (n, h, w) == (25, 48, 64)
        assert dec.probe('/nonexistent.mp4') is None

    def test_decode_matches_cv2(self, test_video):
        from mvfnet_tpu.data.native_io import NativeVideoDecoder
        dec = NativeVideoDecoder()
        inds = np.array([0, 3, 3, 11, 24])
        ours = dec.decode(test_video, inds)
        cap = cv2.VideoCapture(test_video)
        ref = {}
        for i in range(25):
            ok, f = cap.read()
            ref[i] = f
        cap.release()
        for got, idx in zip(ours, inds):
            diff = np.abs(got.astype(int) - ref[int(idx)].astype(int))
            assert diff.mean() < 2.0, (idx, diff.mean())

    def test_clamped_indices(self, test_video):
        from mvfnet_tpu.data.native_io import NativeVideoDecoder
        dec = NativeVideoDecoder()
        out = dec.decode(test_video, np.array([24, 40]))
        assert out is not None and len(out) == 2
        np.testing.assert_array_equal(out[0], out[1])  # clamped to last

    def test_video_io_prefers_native(self, test_video):
        from mvfnet_tpu.data import video_io
        video_io._NATIVE_TRIED = False  # reset cache
        frames = video_io.decode_frames_accurate(test_video,
                                                 np.array([2, 9]))
        assert frames is not None and len(frames) == 2
        assert frames[0].shape == (48, 64, 3)
