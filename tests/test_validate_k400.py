"""Smoke test for the one-command accuracy-parity runbook
(`tools/validate_k400.py`): checkpoint + datalist in, JSON verdict out,
exit code reflects the pass/fail against the published-number budget."""

import json
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
    ws = tmp_path_factory.mktemp('validate')
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
            videos_per_gpu=1, workers_per_gpu=2,
            test=dict(type='RawFramesDataset',
                      ann_file='PLACEHOLDER', data_root='PLACEHOLDER',
                      pipeline=[
                          dict(type='SampleFrames', clip_len=2,
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
        log_level = 'INFO'
    '''))

    # random-init msgpack checkpoint (the runbook's job is plumbing +
    # verdict math, not accuracy itself)
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp

    from mvfnet_tpu import Config
    from mvfnet_tpu.models import build_recognizer
    from mvfnet_tpu.utils.checkpoint import save_checkpoint
    c = Config.fromfile(str(cfg))
    model = build_recognizer(dict(c.model), test_cfg=dict(average_clips=None))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)),
                   None, return_loss=False, train=False)
    ckpt = ws / 'random.msgpack'
    save_checkpoint(str(ckpt), v)
    return ws, cfg, ckpt, data


def run_validate(*args, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    script = os.path.join(REPO, 'tools', 'validate_k400.py')
    return subprocess.run(
        [sys.executable, '-c',
         f"import jax; jax.config.update('jax_platforms','cpu');"
         f"import sys; sys.argv={[script] + list(args)!r};"
         f"exec(compile(open({script!r}).read(), {script!r}, 'exec'),"
         f" {{'__file__': {script!r}, '__name__': '__main__'}})"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)


class TestValidateK400:
    def test_pass_and_fail_verdicts(self, workspace):
        ws, cfg, ckpt, data = workspace
        out = ws / 'verdict.json'
        r = run_validate('--checkpoint', str(ckpt),
                         '--ann', str(data / 'ann.txt'),
                         '--data-root', str(data),
                         '--config', str(cfg),
                         '--expected-top1', '0.0',
                         '--max-videos', '4',
                         '--out', str(out))
        assert r.returncode == 0, r.stderr[-2000:]
        verdict = json.loads(out.read_text())
        assert verdict['pass'] is True
        assert verdict['n_videos'] == 4
        assert 0 <= verdict['top1'] <= 100
        assert verdict['top5'] == 100.0  # 2 classes -> top5 saturates
        # the printed line is the same JSON
        printed = [ln for ln in r.stdout.splitlines()
                   if ln.startswith('{')][-1]
        assert json.loads(printed) == verdict

        # an unreachable expectation must fail with exit code 1
        r = run_validate('--checkpoint', str(ckpt),
                         '--ann', str(data / 'ann.txt'),
                         '--data-root', str(data),
                         '--config', str(cfg),
                         '--expected-top1', '101.0',
                         '--max-videos', '4')
        assert r.returncode == 1, (r.stdout, r.stderr[-2000:])
