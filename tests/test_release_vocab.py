"""Checkpoint-vocabulary audit against the reference's REAL key inventory.

``tests/golden/release_vocab.json`` holds the exact ``state_dict()`` name ->
shape inventory of the reference's released architectures, derived by
EXECUTING the reference model constructors (see
``tools/derive_release_vocab.py``; reference ``codes/models/modules/MVF.py:
57-102``, ``heads/tsn_clshead.py:65-67``, ``backbones/resnet_i3d_slowfast.py``).
Each test synthesizes a state_dict with those exact keys/shapes and asserts
the importer maps it onto the model built from the SHIPPED config with zero
missing / unexpected / size-mismatched parameters — so a release ``.pth``
imports completely, not merely "non-strictly".
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvfnet_tpu.config import Config
from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.utils.checkpoint import import_torch_weights

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))

with open(os.path.join(REPO, 'tests', 'golden', 'release_vocab.json')) as f:
    VOCAB = json.load(f)

# arch name in the fixture -> (shipped config, init input shape (B,T,H,W,C))
CASES = {
    'mvf_r50_8x8': ('configs/mvf/k400/mvf_kinetics400_r50_8x8_dense.py',
                    (1, 8, 64, 64, 3)),
    'mvf_r101_8x8': ('configs/mvf/k400/mvf_kinetics400_r101_8x8_dense.py',
                     (1, 8, 64, 64, 3)),
    # Recognizer3D inputs carry a clips axis: (B, clips, T, H, W, C)
    'i3d_r50': ('configs/i3d/i3d_r50_32x2_k400.py', (1, 1, 8, 64, 64, 3)),
    'slowfast_r50': ('configs/slowfast/slowfast_r50_k400.py',
                     (1, 1, 16, 64, 64, 3)),
    'tsn_bninception': ('configs/tsn/tsn_bninception_k400.py',
                        (1, 3, 96, 96, 3)),
}


def _synth_state_dict(inventory):
    return {k: np.zeros(shape, np.float32) if shape else
            np.zeros((), np.float32)
            for k, shape in inventory.items()}


@pytest.mark.parametrize('arch', sorted(CASES))
def test_release_vocabulary_imports_completely(arch):
    config_path, in_shape = CASES[arch]
    cfg = Config.fromfile(os.path.join(REPO, config_path))
    model = build_recognizer(dict(cfg.model),
                             test_cfg=dict(average_clips='prob'))
    x = jnp.zeros(in_shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, None,
                           return_loss=False, train=False)
    sd = _synth_state_dict(VOCAB[arch])
    new_vars, report = import_torch_weights(sd, variables,
                                            return_report=True)
    assert not report['mismatched'], (
        f'{arch}: size-mismatched keys: {report["mismatched"][:10]}')
    assert not report['unexpected'], (
        f'{arch}: reference keys the importer cannot map: '
        f'{report["unexpected"][:10]}')
    assert not report['missing'], (
        f'{arch}: model params no reference key feeds: '
        f'{report["missing"][:10]}')
    # every reference tensor landed, minus num_batches_tracked bookkeeping
    # and SlowFast's dead layer4_lateral (constructed but never used in the
    # reference forward, resnet_i3d_slowfast.py:504)
    n_real = sum(1 for k in VOCAB[arch]
                 if not k.endswith('num_batches_tracked')
                 and 'layer4_lateral' not in k)
    assert len(report['applied']) == n_real


def test_vocab_fixture_covers_all_archs():
    assert set(CASES) <= set(VOCAB)
    # sanity: the fixture really is the full inventory, not a sample
    assert len(VOCAB['mvf_r50_8x8']) == 392
    assert len(VOCAB['mvf_r101_8x8']) == 834
    assert len(VOCAB['slowfast_r50']) == 643
    # the released MVFNet keys include the wrapped-conv1 names
    assert 'backbone.layer3.0.conv1.net.weight' in VOCAB['mvf_r50_8x8']
    assert 'backbone.layer3.0.conv1.shift_conv.weight' in VOCAB['mvf_r50_8x8']
    assert 'backbone.layer3.0.conv1.bn.running_mean' in VOCAB['mvf_r50_8x8']
    assert 'cls_head.new_fc.weight' in VOCAB['mvf_r50_8x8']
    assert 'cls_head.fc_cls.weight' in VOCAB['i3d_r50']
    assert 'backbone.slow_path.conv1_lateral.weight' in VOCAB['slowfast_r50']
