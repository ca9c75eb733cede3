"""CLI surface integration: train -> test -> report via subprocess, tiny
R18 model on synthetic rawframes (the full user workflow)."""

import os
import subprocess
import sys
import textwrap

import cv2
import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp('cli')
    data = ws / 'data'
    rng = np.random.RandomState(0)
    lines = []
    for v in range(4):
        d = data / f'v{v}'
        d.mkdir(parents=True)
        base = rng.randint(0, 255, (48, 64, 3), np.uint8)
        for f in range(10):
            cv2.imwrite(str(d / f'img_{f + 1:05d}.jpg'), base)
        lines.append(f'v{v} 10 {v % 2}')
    (data / 'ann.txt').write_text('\n'.join(lines) + '\n')

    cfg = ws / 'cfg.py'
    cfg.write_text(textwrap.dedent(f'''
        import numpy as np
        clip_len = 2
        model = dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=512, init_std=0.01, num_classes=2))
        test_cfg = dict(average_clips='prob')
        compute_dtype = 'float32'
        norm = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True, device=True)
        data = dict(
            videos_per_gpu=2, workers_per_gpu=2,
            train=dict(type='RawFramesDataset',
                       ann_file='{data}/ann.txt', data_root='{data}',
                       pipeline=[
                           dict(type='SampleFrames', clip_len=clip_len,
                                frame_interval=2, num_clips=1),
                           dict(type='FrameSelector'),
                           dict(type='RandomResizedCrop', input_size=32),
                           dict(type='Normalize', div_255=False, **norm),
                           dict(type='FormatShape', input_format='NHWC'),
                           dict(type='Collect',
                                keys=['img_group', 'label'], meta_keys=[]),
                       ], test_mode=False, modality='RGB',
                       filename_tmpl='img_{{:05}}.jpg'),
            test=dict(type='RawFramesDataset',
                      ann_file='{data}/ann.txt', data_root='{data}',
                      pipeline=[
                          dict(type='SampleFrames', clip_len=clip_len,
                               frame_interval=2, num_clips=2),
                          dict(type='FrameSelector'),
                          dict(type='Resize', scale=(np.inf, 36),
                               keep_ratio=True),
                          dict(type='CenterCrop', crop_size=32),
                          dict(type='Normalize', div_255=False, **norm),
                          dict(type='FormatShape', input_format='NHWC'),
                          dict(type='Collect',
                               keys=['img_group', 'label'], meta_keys=[]),
                      ], test_mode=True, modality='RGB',
                      filename_tmpl='img_{{:05}}.jpg'))
        optimizer = dict(type='SGD', lr=0.01, momentum=0.9,
                         weight_decay=1e-4, nesterov=True)
        optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
        lr_config = dict(policy='step', step=[100])
        checkpoint_config = dict(interval=1)
        log_config = dict(interval=1, hooks=[dict(type='TextLoggerHook')])
        total_epochs = 1
        log_level = 'INFO'
        work_dir = '{ws}/work'
        load_from = None
        resume_from = None
        eval_interval = 100
    '''))
    return ws, cfg


def run_cli(script, *args, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    # jax_platforms env alone is overridden by this host's sitecustomize;
    # the CLIs honor it because conftest isn't loaded -> force via flag env
    env['JAX_PLATFORMS'] = 'cpu'
    return subprocess.run(
        [sys.executable, '-c',
         f"import jax; jax.config.update('jax_platforms','cpu');"
         f"import sys; sys.argv={[script] + list(args)!r};"
         f"exec(open({script!r}).read())"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)


class TestCLIWorkflow:
    def test_train_test_report(self, workspace):
        ws, cfg = workspace
        r = run_cli('train_recognizer.py', str(cfg), '--seed', '0',
                    '--gpus', '1')
        assert r.returncode == 0, r.stderr[-2000:]
        ckpt = ws / 'work' / 'latest.msgpack'
        assert ckpt.exists()

        out_pkl = ws / 'scores.pkl'
        r = run_cli('test_recognizer.py', str(cfg), str(ckpt),
                    '--out', str(out_pkl))
        assert r.returncode == 0, r.stderr[-2000:]
        assert 'Top-1 Accuracy' in r.stdout
        assert out_pkl.exists()

        r = run_cli('report_accuracy.py', '--scores', str(out_pkl),
                    '--coefficients', '1.0', '--datalist',
                    str(ws / 'data' / 'ann.txt'))
        assert r.returncode == 0, r.stderr[-2000:]
        assert 'Top-1 Accuracy' in r.stdout

        # dense-inference flag plumbing (reference test_recognizer.py:71-79
        # pushes fcn_testing into model+head cfg)
        fcn_pkl = ws / 'scores_fcn.pkl'
        r = run_cli('test_recognizer.py', str(cfg), str(ckpt),
                    '--fcn_testing', '--out', str(fcn_pkl))
        assert r.returncode == 0, r.stderr[-2000:]
        assert 'Top-1 Accuracy' in r.stdout
        import pickle

        import numpy as np
        with open(fcn_pkl, 'rb') as f:
            fcn_scores = np.asarray(pickle.load(f))
        with open(out_pkl, 'rb') as f:
            pooled_scores = np.asarray(pickle.load(f))
        # fcn (1x1x1-conv over the class map) == pooled-FC math for an
        # avg-pool TSN head; scores must agree, not just both run
        np.testing.assert_allclose(fcn_scores, pooled_scores,
                                   rtol=1e-4, atol=1e-5)

        # experimental int8_static eval: the CLI calibrates activation
        # scales on dataset batches, then scores stay close to the exact
        # path (same checkpoint, DESIGN.md "Int8 dense-test")
        qcfg = ws / 'cfg_quant.py'
        qcfg.write_text("_base_ = './cfg.py'\n"
                        "model = dict(backbone=dict(quant='int8_static'))\n")
        q_pkl = ws / 'scores_q.pkl'
        r = run_cli('test_recognizer.py', str(qcfg), str(ckpt),
                    '--out', str(q_pkl), '--calib_videos', '2')
        assert r.returncode == 0, r.stderr[-2000:]
        assert 'calibrating int8' in (r.stdout + r.stderr)
        with open(q_pkl, 'rb') as f:
            q_scores = np.asarray(pickle.load(f))
        np.testing.assert_allclose(q_scores, pooled_scores, atol=0.05)
