"""Subprocess coverage for the two auxiliary CLIs — feature_extractor.py
(reference ``feature_extractor.py:23-131``: per-video pooled features to
JSON) and count_flops.py (reference ``count_flops.py:21-53``)."""

import json
import os
import subprocess
import sys
import textwrap

import cv2
import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))


def run_cli(script, *args, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    return subprocess.run(
        [sys.executable, '-c',
         f"import jax; jax.config.update('jax_platforms','cpu');"
         f"import sys; sys.argv={[script] + list(args)!r};"
         f"exec(compile(open({script!r}).read(), {script!r}, 'exec'),"
         f" {{'__file__': {script!r}, '__name__': '__main__'}})"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp('aux_cli')
    data = ws / 'data'
    rng = np.random.RandomState(2)
    lines = []
    for v in range(3):
        d = data / f'vid{v}'
        d.mkdir(parents=True)
        for f in range(6):
            img = rng.randint(0, 255, (40, 48, 3), np.uint8)
            cv2.imwrite(str(d / f'img_{f + 1:05d}.jpg'), img)
        lines.append(f'vid{v} 6 {v}')
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
                          in_channels=512, init_std=0.01, num_classes=3))
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

    # untrained checkpoint is enough to exercise the extraction path
    import jax
    import jax.numpy as jnp
    from mvfnet_tpu import Config
    from mvfnet_tpu.models import build_recognizer
    from mvfnet_tpu.utils.checkpoint import save_checkpoint
    c = Config.fromfile(str(cfg))
    model = build_recognizer(dict(c.model), test_cfg=dict(c.test_cfg))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, 32, 32, 3), jnp.float32), None,
                           return_loss=False, train=False)
    ckpt = ws / 'init.msgpack'
    save_checkpoint(str(ckpt), variables, meta={'epoch': 0})
    return ws, cfg, ckpt


class TestFeatureExtractorCLI:
    def test_features_json(self, workspace):
        ws, cfg, ckpt = workspace
        out = ws / 'features.json'
        r = run_cli('feature_extractor.py', str(cfg), str(ckpt),
                    '--out', str(out))
        assert r.returncode == 0, r.stderr[-2000:]
        feats = json.loads(out.read_text())
        assert set(feats) == {'vid0', 'vid1', 'vid2'}
        for vec in feats.values():
            assert len(vec) == 512
            assert np.all(np.isfinite(vec))
        # different videos -> different features (not a constant output)
        assert not np.allclose(feats['vid0'], feats['vid1'])


class TestCountFlopsCLI:
    def test_reports_params_and_gmacs(self, workspace):
        ws, cfg, ckpt = workspace
        r = run_cli('count_flops.py', str(cfg),
                    '--shape', '1', '2', '32', '32', '3')
        assert r.returncode == 0, r.stderr[-2000:]
        assert 'params:' in r.stdout
        assert 'GFLOPs' in r.stdout
        # R18 ~11.2M params for 3 classes
        m = float(r.stdout.split('params:')[1].split('M')[0])
        assert 10.5 < m < 12.0
