"""Data-prep tool + FileClient tests."""

import os
import pickle
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), '..')


def run_tool(name, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, 'data_process', name), *args],
        capture_output=True, text=True)


class TestFileClient:
    def test_disk_backend(self, tmp_path):
        from mvfnet_tpu.utils.file_client import FileClient
        p = tmp_path / 'x.bin'
        p.write_bytes(b'hello')
        assert FileClient('disk').get(str(p)) == b'hello'

    def test_unknown_backend(self):
        from mvfnet_tpu.utils.file_client import FileClient
        with pytest.raises(ValueError):
            FileClient('nope')


@pytest.fixture(scope='module')
def video_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('videos')
    (root / 'classA').mkdir()
    path = str(root / 'classA' / 'vid0.mp4')
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 10.0,
                        (64, 48))
    rng = np.random.RandomState(0)
    for _ in range(20):
        w.write(rng.randint(0, 255, (48, 64, 3), np.uint8))
    w.release()
    return root


class TestVideoTools:
    def test_video2image(self, video_tree, tmp_path):
        out = tmp_path / 'frames'
        r = run_tool('video2image.py', str(video_tree), str(out),
                     '--level', '2', '--num-workers', '1')
        assert r.returncode == 0, r.stderr
        frames = sorted(os.listdir(out / 'classA' / 'vid0'))
        assert len(frames) == 20
        assert frames[0] == 'img_00001.jpg'

    def test_video2image_short_edge(self, video_tree, tmp_path):
        out = tmp_path / 'frames_resized'
        r = run_tool('video2image.py', str(video_tree), str(out),
                     '--short-edge', '32', '--num-workers', '1')
        assert r.returncode == 0, r.stderr
        img = cv2.imread(str(out / 'classA' / 'vid0' / 'img_00001.jpg'))
        assert min(img.shape[:2]) == 32

    def test_gen_videos_info(self, video_tree, tmp_path):
        out = tmp_path / 'info.txt'
        r = run_tool('gen_videos_info.py', str(video_tree),
                     '--out', str(out))
        assert r.returncode == 0, r.stderr
        line = out.read_text().strip()
        assert line.startswith('classA/vid0.mp4 20')

    def test_gen_k400_pkl(self, video_tree, tmp_path):
        frames = tmp_path / 'frames'
        run_tool('video2image.py', str(video_tree), str(frames),
                 '--num-workers', '1')
        out = tmp_path / 'pkl'
        r = run_tool('gen_k400_pkl.py', str(frames), str(out),
                     '--num-workers', '1')
        assert r.returncode == 0, r.stderr
        with open(out / 'classA' / 'vid0.pkl', 'rb') as f:
            blobs = pickle.load(f)
        assert len(blobs) == 20
        img = cv2.imdecode(np.frombuffer(blobs[0], np.uint8),
                           cv2.IMREAD_COLOR)
        assert img.shape == (48, 64, 3)


class TestGenLabel:
    def test_ucf101_rawframes(self, tmp_path):
        ann = tmp_path / 'annotation' / 'ucf101'
        ann.mkdir(parents=True)
        (ann / 'classInd.txt').write_text(
            '1 ApplyEyeMakeup\n2 Archery\n')
        (ann / 'trainlist01.txt').write_text(
            'ApplyEyeMakeup/v_A_g01_c01.avi 1\n'
            'Archery/v_B_g01_c01.avi 2\n')
        data = tmp_path / 'frames'
        for d in ['ApplyEyeMakeup/v_A_g01_c01', 'Archery/v_B_g01_c01']:
            (data / d).mkdir(parents=True)
            for i in range(3):
                (data / d / f'img_{i + 1:05d}.jpg').write_bytes(b'x')
        r = run_tool('gen_label.py', str(data), 'ucf101',
                     '--ann_root', str(tmp_path / 'annotation'),
                     '--out_root', str(tmp_path / 'datalist'),
                     '--phase', 'train', '--source', 'rgb')
        assert r.returncode == 0, r.stderr
        lines = (tmp_path / 'datalist' / 'ucf101' /
                 'train_rgb_split1.txt').read_text().strip().split('\n')
        assert 'ApplyEyeMakeup/v_A_g01_c01 3 0' in lines
        assert 'Archery/v_B_g01_c01 3 1' in lines

    def test_make_balance(self, tmp_path):
        ann = tmp_path / 'ann.txt'
        ann.write_text('a 10 0\nb 10 0\nc 10 0\nd 10 1\n')
        out = tmp_path / 'balanced.txt'
        r = run_tool('make_balance.py', str(ann), '--out', str(out))
        assert r.returncode == 0, r.stderr
        lines = out.read_text().strip().split('\n')
        labels = [line.split()[-1] for line in lines]
        assert labels.count('0') == labels.count('1') == 3
