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


def _iter_dataset_nodes(node):
    """Yield every dataset dict (unwrapping RepeatDataset) in a data split."""
    if not isinstance(node, dict):
        return
    if node.get('type') == 'RepeatDataset':
        yield from _iter_dataset_nodes(node.get('dataset'))
    elif 'ann_file' in node:
        yield node


@pytest.mark.parametrize('path', CONFIGS, ids=[os.path.basename(p)
                                               for p in CONFIGS])
def test_config_ann_files_resolve(path):
    """Every shipped config's ann_file must exist in-repo, except K400
    lists, which are user-supplied (datalist/kinetics400/README.md
    documents how to generate them — the videos aren't redistributable)."""
    cfg = Config.fromfile(path)
    for split in ('train', 'val', 'test'):
        for node in _iter_dataset_nodes((cfg.get('data') or {}).get(split)):
            ann = node['ann_file']
            if ann.startswith('datalist/kinetics400/'):
                assert os.path.exists(
                    os.path.join(REPO, 'datalist/kinetics400/README.md'))
                continue
            assert os.path.exists(os.path.join(REPO, ann)), (
                f'{os.path.basename(path)} [{split}] points at missing '
                f'annotation list {ann}')


def test_finetune_config_loads_vendored_datalist():
    """The UCF101 finetune recipe must build a real dataset from the
    vendored split list (reference datalist/ucf101/train_rgb_split_1.txt)."""
    from mvfnet_tpu.data import build_dataset
    cfg = Config.fromfile(os.path.join(
        REPO, 'configs/mvf/ucf101/mvf_ucf101_r50_8x8_finetune.py'))
    node = dict(cfg.data['val'])
    node['ann_file'] = os.path.join(REPO, node['ann_file'])
    ds = build_dataset(node)
    assert len(ds) == 3783  # official UCF101 split-1 test set
    info = ds.video_infos[0]
    assert {'filename', 'total_frames', 'label'} <= set(info)


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
