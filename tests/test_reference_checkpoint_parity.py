"""Checkpoint-I/O semantics pinned against the EXECUTING reference.

``codes/utils/checkpoint.py`` executes byte-identical (torchvision stubbed
for its unused modelzoo path): its non-strict ``load_state_dict`` with
missing/unexpected-key reporting, ``module.`` prefix strip, and
``state_dict`` wrapper unwrap.  A deliberately damaged checkpoint (one
param deleted, one bogus key injected, ``module.``-prefixed, wrapped) is
loaded through the reference's ``load_checkpoint`` into a reference model
and through our ``.pth`` ingestion into flax variables; the two final
weight trees must be identical — present keys applied, absent keys left at
their initialization on BOTH sides — and both reporters must flag the
same key diff.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.utils.checkpoint import (import_torch_weights,
                                         load_torch_state_dict)

from reference_loader import load_reference, load_reference_checkpoint

NUM_CLASSES = 5
T = 2
HW = 32
DELETED = 'backbone.layer1.0.conv1.weight'
BOGUS = 'backbone.not_a_real.weight'


def _ref_cfg():
    # depth 50, not 18: the reference's OWN ResNet-18/34 path is
    # unbuildable — ``make_res_layer`` unconditionally passes
    # ``avd``/``avd_first`` (resnet.py:308-316) which ``BasicBlock``
    # (resnet.py:43-51) does not accept. See
    # TestReferenceBasicBlockBug below.
    return dict(
        type='Recognizer2D',
        backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                      norm_eval=False,
                      norm_cfg=dict(type='BN', requires_grad=True)),
        cls_head=dict(type='TSNClsHead', spatial_size=-1,
                      spatial_type='avg', dropout_ratio=0.0,
                      in_channels=2048, init_std=0.01,
                      num_classes=NUM_CLASSES))


def _flax_cfg():
    cfg = _ref_cfg()
    cfg['dtype'] = None
    return cfg


def _build_ref(ref, seed):
    torch.manual_seed(seed)
    model = ref.build_recognizer(_ref_cfg(), train_cfg=None,
                                 test_cfg=dict(average_clips=None))
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    return model


def _flax_from_sd(sd):
    model = build_recognizer(_flax_cfg(), test_cfg=dict(average_clips=None))
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        jnp.zeros((1, T, HW, HW, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32), return_loss=True, train=True)
    return import_torch_weights(sd, variables)


def _flat(tree):
    return {('/'.join(str(p) for p in path)): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree)}


class TestDamagedCheckpointLoad:

    def test_same_final_weights_and_key_diff(self, tmp_path, capsys):
        ref = load_reference()
        refckpt = load_reference_checkpoint()

        donor = _build_ref(ref, seed=2)
        ckpt_sd = {f'module.{k}': v
                   for k, v in donor.state_dict().items()
                   if k != DELETED}
        ckpt_sd[f'module.{BOGUS}'] = torch.zeros(3)
        path = str(tmp_path / 'damaged.pth')
        torch.save({'state_dict': ckpt_sd, 'meta': {'epoch': 7}}, path)

        # --- reference side: in-place non-strict load into a seed-1 init
        ref_dst = _build_ref(ref, seed=1)
        sd_init = {k: v.detach().numpy().copy()
                   for k, v in ref_dst.state_dict().items()}
        returned = refckpt.load_checkpoint(ref_dst, path,
                                           map_location='cpu')
        assert returned['meta']['epoch'] == 7
        msg = capsys.readouterr().out
        assert BOGUS in msg            # unexpected key reported
        assert DELETED in msg          # missing key reported
        assert 'num_batches_tracked' not in msg
        sd_final = {k: v.detach().numpy()
                    for k, v in ref_dst.state_dict().items()}
        # present keys overwritten, deleted key untouched on the ref side
        np.testing.assert_array_equal(sd_final[DELETED], sd_init[DELETED])
        assert not np.array_equal(sd_final['backbone.conv1.weight'],
                                  sd_init['backbone.conv1.weight'])

        # --- our side: same init (imported), then our .pth ingestion
        variables_init = _flax_from_sd(sd_init)
        loaded = load_torch_state_dict(path)   # unwraps + strips module.
        assert DELETED not in loaded and BOGUS in loaded
        variables_final, report = import_torch_weights(
            loaded, variables_init, return_report=True)

        assert BOGUS in report['unexpected']
        assert any(DELETED.split('.')[-2] in m and 'conv1' in m
                   for m in report['missing'])

        # --- the behavioral pin: our post-load tree == the reference's
        #     post-load state_dict imported over the same init
        expected = import_torch_weights(sd_final, variables_init)
        got, want = _flat(variables_final), _flat(expected)
        assert got.keys() == want.keys() and got
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


class TestReferenceBasicBlockBug:

    def test_reference_resnet18_is_unbuildable(self):
        """Documents a bug in the reference's OWN code: ``make_res_layer``
        unconditionally passes ``avd=avd, avd_first=avd_first``
        (``resnet.py:306-316``) but ``BasicBlock.__init__``
        (``resnet.py:43-51``) has no such parameters, so every depth-18/34
        ResNet construction raises. Our ResNet-18 builds and runs
        (tests/test_models.py); behavioral parity for BasicBlock depths is
        therefore pinned at the architecture-spec level, not against
        executing reference bytes — there are none that run."""
        ref = load_reference()
        with pytest.raises(TypeError, match='avd'):
            ref.ResNet(depth=18)


class TestSaveLoadRoundTrip:

    def test_reference_saved_checkpoint_ingests(self, tmp_path):
        """A checkpoint written by the reference's own save_checkpoint
        (``checkpoint.py:235-264``) round-trips through our ingestion."""
        ref = load_reference()
        refckpt = load_reference_checkpoint()
        model = _build_ref(ref, seed=3)
        path = str(tmp_path / 'ref_saved.pth')
        refckpt.save_checkpoint(model, path, meta=dict(epoch=1))

        loaded = load_torch_state_dict(path)
        variables, report = import_torch_weights(
            loaded, _flax_from_sd(
                {k: v.detach().numpy() for k, v in
                 model.state_dict().items()}), return_report=True)
        assert not report['missing'] and not report['mismatched']
        want = _flat(_flax_from_sd(
            {k: v.detach().numpy() for k, v in model.state_dict().items()}))
        got = _flat(variables)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
