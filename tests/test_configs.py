"""Every shipped config must load, build its model, and construct its
pipelines (catches config/registry drift without compiling)."""

import glob
import os

import pytest

from mvfnet_tpu import Config
from mvfnet_tpu.data import Compose
from mvfnet_tpu.models import build_recognizer

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
CONFIGS = sorted(glob.glob(os.path.join(REPO, 'configs', '**', '*.py'),
                           recursive=True))


@pytest.mark.parametrize('path', CONFIGS, ids=[os.path.basename(p)
                                               for p in CONFIGS])
def test_config_builds(path):
    cfg = Config.fromfile(path)
    model = build_recognizer(dict(cfg.model),
                             test_cfg=cfg.get('test_cfg')
                             or dict(average_clips='prob'))
    assert model is not None
    for split in ('train', 'val', 'test'):
        node = (cfg.get('data') or {}).get(split)
        if node and 'pipeline' in node:
            Compose(node['pipeline'])
    # schedule keys the engine requires
    assert 'optimizer' in cfg and 'lr_config' in cfg
    assert cfg.get('total_epochs')


def test_all_config_families_present():
    names = {os.path.basename(p) for p in CONFIGS}
    assert any('r50_8x8' in n for n in names)
    assert any('r101' in n for n in names)
    assert any('video' in n for n in names)
    assert any('ucf101' in n for n in names)
    assert any('hmdb51' in n for n in names)
    assert any('sthv1' in n for n in names)
    assert any('slowfast' in n for n in names)
    assert any('i3d' in n for n in names)
    assert any('x3d' in n for n in names)
    assert any('flow' in n for n in names)
