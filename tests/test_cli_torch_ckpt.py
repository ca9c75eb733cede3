"""Reference-user migration seam, end to end via subprocess: a torch
``.pth`` checkpoint in the reference release vocabulary
(``backbone.layerX.j.conv1.{net,shift_conv,h_conv,w_conv,bn}``,
``cls_head.new_fc``) is (a) consumed directly by ``test_recognizer.py``
and (b) converted by ``tools/convert_checkpoint.py``; both routes must
produce identical scores. Mirrors the reference test path
(``/root/reference/test_recognizer.py:56`` +
``codes/utils/checkpoint.py:178``)."""

import os
import pickle
import subprocess
import sys
import textwrap

import cv2
import numpy as np
import pytest
import torch

from torch_oracle import TorchMVFNetR50, export_reference_style_state_dict

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))

NUM_CLASSES = 5
CLIP_LEN = 2


def run_cli(script, *args, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    # this host's sitecustomize overrides the env var; force via config
    return subprocess.run(
        [sys.executable, '-c',
         f"import jax; jax.config.update('jax_platforms','cpu');"
         f"import sys; sys.argv={[script] + list(args)!r};"
         f"exec(compile(open({script!r}).read(), {script!r}, 'exec'),"
         f" {{'__file__': {script!r}, '__name__': '__main__'}})"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp('torch_ckpt')
    data = ws / 'data'
    rng = np.random.RandomState(1)
    lines = []
    for v in range(3):
        d = data / f'v{v}'
        d.mkdir(parents=True)
        for f in range(6):
            img = rng.randint(0, 255, (40, 48, 3), np.uint8)
            cv2.imwrite(str(d / f'img_{f + 1:05d}.jpg'), img)
        lines.append(f'v{v} 6 {v % NUM_CLASSES}')
    (data / 'ann.txt').write_text('\n'.join(lines) + '\n')

    torch.manual_seed(0)
    oracle = TorchMVFNetR50(num_classes=NUM_CLASSES, n_segment=CLIP_LEN)
    oracle.eval()
    pth = ws / 'oracle.pth'
    torch.save({'state_dict': export_reference_style_state_dict(oracle)},
               str(pth))

    cfg = ws / 'cfg.py'
    cfg.write_text(textwrap.dedent(f'''
        import numpy as np
        clip_len = {CLIP_LEN}
        model = dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=2048, init_std=0.01,
                          num_classes={NUM_CLASSES}),
            module_cfg=dict(type='MVF', n_segment=clip_len, alpha=0.125,
                            mvf_freq=(0, 0, 1, 1), mode='THW'))
        test_cfg = dict(average_clips='prob')
        compute_dtype = 'float32'
        data = dict(
            videos_per_gpu=1, workers_per_gpu=1,
            test=dict(type='RawFramesDataset',
                      ann_file='{data}/ann.txt', data_root='{data}',
                      pipeline=[
                          dict(type='SampleFrames', clip_len=clip_len,
                               frame_interval=2, num_clips=1),
                          dict(type='FrameSelector'),
                          dict(type='Resize', scale=(np.inf, 36),
                               keep_ratio=True),
                          dict(type='CenterCrop', crop_size=32),
                          dict(type='Normalize',
                               mean=[123.675, 116.28, 103.53],
                               std=[58.395, 57.12, 57.375],
                               to_rgb=True, div_255=False),
                          dict(type='FormatShape', input_format='NHWC'),
                          dict(type='Collect',
                               keys=['img_group', 'label'], meta_keys=[]),
                      ], test_mode=True, modality='RGB',
                      filename_tmpl='img_{{:05}}.jpg'))
    '''))
    return ws, cfg, pth


class TestTorchCheckpointCLI:
    def test_pth_direct_and_converted_agree(self, workspace):
        ws, cfg, pth = workspace

        s_pth = ws / 'scores_pth.pkl'
        r = run_cli('test_recognizer.py', str(cfg), str(pth),
                    '--out', str(s_pth))
        assert r.returncode == 0, r.stderr[-2000:]
        assert 'Top-1 Accuracy' in r.stdout
        with open(s_pth, 'rb') as f:
            scores_pth = np.asarray(pickle.load(f))
        assert scores_pth.shape == (3, NUM_CLASSES)
        assert np.all(np.isfinite(scores_pth))
        # imported weights, not init noise: per-video scores must differ
        assert not np.allclose(scores_pth[0], scores_pth[1])

        msgpack = ws / 'oracle.msgpack'
        r = run_cli('tools/convert_checkpoint.py', str(cfg), str(pth),
                    str(msgpack))
        assert r.returncode == 0, r.stderr[-2000:]
        assert msgpack.exists()

        s_native = ws / 'scores_native.pkl'
        r = run_cli('test_recognizer.py', str(cfg), str(msgpack),
                    '--out', str(s_native))
        assert r.returncode == 0, r.stderr[-2000:]
        with open(s_native, 'rb') as f:
            scores_native = np.asarray(pickle.load(f))
        np.testing.assert_allclose(scores_native, scores_pth,
                                   rtol=1e-5, atol=1e-6)
