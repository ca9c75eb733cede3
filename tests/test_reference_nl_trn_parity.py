"""Executing-reference parity for the non-local (LocalAttention) and TRN
consensus subsystems — the last two model components whose torch-parity
evidence did not yet route through the ACTUAL reference code.

Oracles (loaded byte-identical via tests/reference_loader.py):
- ``codes/models/modules/local_attention.py`` — ``LocalAttention`` (module
  level, every instantiation/option) and the full ``make_non_local``-wrapped
  R50+MVF recognizer (``recognizer2d.py:66-69``), through the importer.
- ``codes/models/heads/segmental_consensuses/relation_consensus.py`` —
  ``RelationModule`` / ``RelationModuleMultiScale`` with scripted-decision
  RNG alignment (the reference's per-forward ``np.random.choice`` and our
  subset pick are driven by the same scripted index sequence; each side's
  actual RNG mechanics are unit-tested separately).

Third reference bug found by executing it (documented here as a test):
``TSNClsHead`` wires ``return_TRN(self.consensus_type, in_channels, ...)``
(``tsn_clshead.py:42-44``) while ``new_fc`` projects to 256
(``tsn_clshead.py:63-65``), so every reference TRN head forward crashes in
``RelationModule.forward``'s view (:30-31). The TRN consensus was therefore
never runnable through the reference's own head; our head passes the
projected dim and is pinned against the reference's consensus modules
composed the intended way (TSM/TRN upstream semantics).

All comparisons float64; tolerances as in test_reference_oracle_parity.py.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.models.heads import consensus as consensus_mod
from mvfnet_tpu.models.heads.tsn_head import TSNClsHead
from mvfnet_tpu.models.modules.nonlocal_attention import LocalAttention
from mvfnet_tpu.utils.checkpoint import import_torch_weights

from reference_loader import load_reference

NUM_CLASSES = 6


@pytest.fixture(scope='module')
def f64():
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', False)


@pytest.fixture(scope='module')
def ref():
    return load_reference()


@pytest.fixture(scope='module')
def ref_la(ref):
    import sys
    return sys.modules['refcodes.models.modules.local_attention']


def _conv3d_to_flax(w):
    # torch Conv3d (O, I, kT, kH, kW) -> flax (kT, kH, kW, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def _la_variables(tla, dtype=np.float64):
    """Reference LocalAttention state -> our flax variable tree."""
    sd = {k: v.detach().numpy().astype(dtype)
          for k, v in tla.state_dict().items()}
    params = {
        'conv_in': {'kernel': _conv3d_to_flax(sd['conv_in.weight']),
                    'bias': sd['conv_in.bias']},
        'conv_out': {'kernel': _conv3d_to_flax(sd['conv_out.weight']),
                     'bias': sd['conv_out.bias']},
        'bn': {'scale': sd['bn.weight'], 'bias': sd['bn.bias']},
    }
    if 'time_weighting' in sd:
        params['time_weighting'] = sd['time_weighting']
    stats = {'bn': {'mean': sd['bn.running_mean'],
                    'var': sd['bn.running_var']}}
    return {'params': params, 'batch_stats': stats}


def _randomize(tla, seed):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in tla.parameters():
            p.normal_(0, 0.2)
        tla.bn.weight.uniform_(0.8, 1.2)
        tla.bn.bias.normal_(0, 0.1)
        tla.bn.running_mean.normal_(0, 0.05)
        tla.bn.running_var.uniform_(0.8, 1.2)


class TestLocalAttentionVsReferenceCode:
    """Module-level: the reference LocalAttention executes as the oracle
    (``local_attention.py:12-167``): qkv conv, T*K*K unfold tube, affinity
    normalization, fold overlap-add, out-projection + BN residual."""

    N, C, T, H, W = 2, 16, 4, 6, 6

    def _run_pair(self, ref_la, f64, train=False, **kw):
        tla = ref_la.LocalAttention(self.C, self.C // 2, **kw)
        _randomize(tla, seed=hash(tuple(sorted(kw.items()))) % 1000)
        tla = tla.double()
        tla.train(train)

        ours = LocalAttention(dim=self.C, hidden=self.C // 2,
                              instantiation=kw.get('instantiation',
                                                   'dot_product'),
                              use_time_shift=kw.get('use_time_shift', False),
                              time_weighting_size=kw.get(
                                  'time_weighting_size'),
                              dtype=None)
        variables = _la_variables(tla)

        rng = np.random.RandomState(3)
        x = rng.randn(self.N, self.C, self.T, self.H,
                      self.W).astype(np.float64)
        xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # NTHWC

        if train:
            out_t = tla(torch.from_numpy(x))
            out_j, mutated = ours.apply(variables, xj, train=True,
                                        mutable=['batch_stats'])
            # train-mode BN buffers must move identically (torch unbiased
            # EMA semantics, models/common.py::TorchBatchNorm)
            np.testing.assert_allclose(
                np.asarray(mutated['batch_stats']['bn']['mean']),
                tla.bn.running_mean.detach().numpy(), rtol=1e-10,
                atol=1e-15)
            np.testing.assert_allclose(
                np.asarray(mutated['batch_stats']['bn']['var']),
                tla.bn.running_var.detach().numpy(), rtol=1e-10, atol=1e-15)
        else:
            with torch.no_grad():
                out_t = tla(torch.from_numpy(x))
            out_j = ours.apply(variables, xj)
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.detach().numpy().transpose(0, 2, 3,
                                                                4, 1),
            rtol=1e-9, atol=1e-12)

    def test_dot_product_eval(self, f64, ref_la):
        self._run_pair(ref_la, f64)

    def test_dot_product_train_mode(self, f64, ref_la):
        self._run_pair(ref_la, f64, train=True)

    def test_softmax_instantiation(self, f64, ref_la):
        self._run_pair(ref_la, f64, instantiation='softmax')

    def test_time_shift_and_weighting(self, f64, ref_la):
        # time shift applies to theta/phi/g AFTER the qkv projection
        # (``_unfold_and_view``, local_attention.py:128-154) — an earlier
        # version of our module shifted the input instead; this pins the fix
        k2t = self.T * 9
        self._run_pair(ref_la, f64, use_time_shift=True,
                       time_weighting_size=(k2t, k2t, self.H * self.W))

    def test_build_nonlocal_block_defaults(self, f64, ref_la):
        """``build_nonlocal_block`` (local_attention.py:242-263): embed_dim
        defaults to dim // 2 — both factories agree on the constructed
        geometry."""
        from mvfnet_tpu.models.modules.nonlocal_attention import (
            build_nonlocal_block)
        t = ref_la.build_nonlocal_block(dict(in_channels=32))
        ours = build_nonlocal_block(dict(in_channels=32))
        assert t.conv_in.weight.shape[0] == 3 * ours.hidden
        assert t.conv_out.weight.shape[0] == ours.dim == 32


# ---------------------------------------------------------------------------
# full net: make_non_local-wrapped R50+MVF recognizer
# ---------------------------------------------------------------------------

T_SEG = 4
HW = 32
B = 2


def _nl_ref_cfg():
    return dict(
        type='Recognizer2D',
        backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                      norm_eval=False,
                      norm_cfg=dict(type='BN', requires_grad=True)),
        cls_head=dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                      dropout_ratio=0.0, in_channels=2048, init_std=0.01,
                      num_classes=NUM_CLASSES),
        module_cfg=dict(type='MVF', n_segment=T_SEG, alpha=0.125,
                        mvf_freq=(0, 0, 1, 1), mode='THW'),
        nonlocal_cfg=dict(n_segment=T_SEG),
    )


def _nl_flax_cfg():
    return dict(
        type='Recognizer2D',
        backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                      norm_eval=False,
                      norm_cfg=dict(type='BN', requires_grad=True)),
        cls_head=dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                      dropout_ratio=0.0, in_channels=2048, init_std=0.01,
                      num_classes=NUM_CLASSES),
        module_cfg=dict(type='MVF', n_segment=T_SEG, alpha=0.125,
                        mvf_freq=(0, 0, 1, 1), mode='THW'),
        nonlocal_cfg=dict(n_segment=T_SEG),
        dtype=None)


@pytest.mark.slow
class TestNonLocalRecognizerVsReferenceCode:
    def test_eval_scores_and_train_loss(self, f64, ref):
        """The ``make_non_local``-wrapped backbone end to end
        (``recognizer2d.py:66-69`` + ``local_attention.py:192-222``: 2
        wrappers in layer2 at indices 1,3 and 3 in layer3 at 1,3,5 for R50)
        against our declarative nonlocal insertion
        (``backbones/resnet.py:516-528``), weights moved by the importer."""
        torch.manual_seed(7)
        ref_model = ref.build_recognizer(_nl_ref_cfg(), train_cfg=None,
                                         test_cfg=dict(average_clips=None))
        with torch.no_grad():
            for m in ref_model.modules():
                if isinstance(m, (torch.nn.BatchNorm2d,
                                  torch.nn.BatchNorm3d)):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
        ref_model = ref_model.double()
        # the surgery actually happened
        assert any('nl.conv_in' in n for n, _ in ref_model.named_parameters())

        model = build_recognizer(_nl_flax_cfg(),
                                 test_cfg=dict(average_clips=None))
        variables = model.init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(1)},
            jnp.zeros((1, T_SEG, HW, HW, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32), return_loss=True, train=True)
        variables = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), variables)
        sd = {k: v.detach().numpy()
              for k, v in ref_model.state_dict().items()}
        variables, report = import_torch_weights(sd, variables,
                                                 return_report=True)
        # vocabulary completeness: every reference key lands, every target
        # leaf is filled
        assert not report['unexpected'], report['unexpected'][:5]
        assert not report['missing'], report['missing'][:5]
        assert not report['mismatched'], report['mismatched'][:5]

        rng = np.random.RandomState(11)
        imgs = rng.randn(B, T_SEG, HW, HW, 3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES, size=(B,)).astype(np.int64)
        x5 = torch.from_numpy(
            imgs.reshape(B * T_SEG, HW, HW, 3).transpose(0, 3, 1, 2)
        ).reshape(B, T_SEG, 3, HW, HW)

        ref_model.eval()
        with torch.no_grad():
            ref_scores = ref_model(img_group=x5, label=None,
                                   return_loss=False, return_numpy=True)
        ours = model.apply(variables, jnp.asarray(imgs), None,
                           return_loss=False)
        np.testing.assert_allclose(np.asarray(ours), ref_scores, rtol=1e-9,
                                   atol=1e-12)

        ref_model.train()
        with torch.no_grad():
            losses = ref_model(img_group=x5,
                               label=torch.from_numpy(labels),
                               return_loss=True)
        our_losses, _ = model.apply(
            variables, jnp.asarray(imgs), jnp.asarray(labels),
            return_loss=True, train=True,
            rngs={'dropout': jax.random.PRNGKey(0)},
            mutable=['batch_stats'])
        np.testing.assert_allclose(float(our_losses['loss_cls']),
                                   losses['loss_cls'].item(), rtol=1e-10)


# ---------------------------------------------------------------------------
# TRN consensus
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def ref_rc(ref):
    import sys
    return sys.modules[
        'refcodes.models.heads.segmental_consensuses.relation_consensus']


class _ScriptedChoice:
    """Deterministic stand-in for the subset draw on both sides: returns the
    next scripted index array regardless of the RNG mechanics."""

    def __init__(self, picks):
        self.picks = list(picks)
        self.i = 0

    def __call__(self, n, k, replace=False):
        out = np.asarray(self.picks[self.i][:k], dtype=np.int64)
        self.i += 1
        assert len(out) == k and out.max() < np.asarray(n).item()
        return out


def _trn_multiscale_variables(tm, dtype=np.float64):
    """Reference RelationModuleMultiScale state -> our param tree
    (positional fc_fusion_{i}_fc{1,2} naming)."""
    params = {}
    for i, seq in enumerate(tm.fc_fusion_scales):
        params[f'fc_fusion_{i}_fc1'] = {
            'kernel': seq[1].weight.detach().numpy().T.astype(dtype),
            'bias': seq[1].bias.detach().numpy().astype(dtype)}
        params[f'fc_fusion_{i}_fc2'] = {
            'kernel': seq[3].weight.detach().numpy().T.astype(dtype),
            'bias': seq[3].bias.detach().numpy().astype(dtype)}
    return {'params': params}


class TestTRNVsReferenceCode:
    DIM, NF = 16, 4

    def test_single_scale_relation_module(self, f64, ref_rc):
        """RelationModule (relation_consensus.py:7-33): ReLU -> Linear(512)
        -> ReLU -> Linear(num_class) over the flattened frame stack.
        Deterministic — no RNG to align."""
        torch.manual_seed(21)
        tm = ref_rc.RelationModule(self.DIM, self.NF, NUM_CLASSES).double()
        ours = consensus_mod.RelationModule(
            img_feature_dim=self.DIM, num_frames=self.NF,
            num_classes=NUM_CLASSES, dtype=None)
        variables = {'params': {
            'fc1': {'kernel': tm.classifier[1].weight.detach().numpy().T,
                    'bias': tm.classifier[1].bias.detach().numpy()},
            'fc2': {'kernel': tm.classifier[3].weight.detach().numpy().T,
                    'bias': tm.classifier[3].bias.detach().numpy()},
        }}
        rng = np.random.RandomState(4)
        x = rng.randn(3, self.NF, self.DIM)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(x))
        out_j = ours.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j)[:, 0],
                                   out_t.numpy(), rtol=1e-9, atol=1e-12)

    def test_multiscale_scripted_subsets(self, f64, ref_rc, monkeypatch):
        """RelationModuleMultiScale (relation_consensus.py:36-99) with the
        per-forward subset draws scripted identically on both sides: the
        reference's ``np.random.choice`` and our ``_deterministic_pick``
        both return the same index arrays, pinning the per-scale MLPs,
        subset gathers, and the accumulation order."""
        torch.manual_seed(22)
        tm = ref_rc.RelationModuleMultiScale(self.DIM, self.NF,
                                             NUM_CLASSES).double()
        ours = consensus_mod.RelationModuleMultiScale(
            img_feature_dim=self.DIM, num_frames=self.NF,
            num_classes=NUM_CLASSES, dtype=None)
        variables = _trn_multiscale_variables(tm)

        # scales for NF=4 are [4, 3, 2]; scale 4 has 1 subset (taken
        # directly), scale 3 has C(4,3)=4 subsets, scale 2 has C(4,2)=6
        picks = [np.array([2, 0, 3]), np.array([5, 1, 4])]
        monkeypatch.setattr(ref_rc.np.random, 'choice',
                            _ScriptedChoice(picks))
        scripted = iter([p.astype(np.int32) for p in picks])
        monkeypatch.setattr(consensus_mod, '_deterministic_pick',
                            lambda n, k: next(scripted))

        rng = np.random.RandomState(5)
        x = rng.randn(3, self.NF, self.DIM)
        with torch.no_grad():
            out_t = tm(torch.from_numpy(x))
        out_j = ours.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j)[:, 0],
                                   out_t.numpy(), rtol=1e-9, atol=1e-12)

    def test_reference_trn_head_is_broken(self, ref):
        """Reference bug #3 (found by executing it): TSNClsHead passes
        ``in_channels`` as ``img_feature_dim`` to ``return_TRN``
        (tsn_clshead.py:42-44) while feeding it ``new_fc``'s 256-dim output
        (:63-65, :92-96), so every TRN-consensus forward crashes. The TRN
        path was never runnable through the reference's own head."""
        torch.manual_seed(0)
        head = ref.TSNClsHead(
            spatial_type='avg', spatial_size=-1,
            consensus_cfg=dict(type='TRNmultiscale', num_frames=self.NF),
            dropout_ratio=0.0, in_channels=32, num_classes=NUM_CLASSES)
        head.eval()
        x = torch.randn(2 * self.NF, 32, 7, 7)
        with pytest.raises(RuntimeError, match='invalid for input'):
            head(x, self.NF)

    def test_head_level_intended_composition(self, f64, ref, ref_rc,
                                             monkeypatch):
        """Our full TRN head (importer-loaded) against the reference's own
        pieces composed the intended way: reference ``new_fc`` (in_channels
        -> 256, tsn_clshead.py:63-65) -> reshape (B, num_seg, 256) ->
        reference RelationModuleMultiScale built with img_feature_dim=256.
        Also exercises the importer's ``cls_head.segmental_consensus.*``
        vocabulary."""
        in_ch = 32
        torch.manual_seed(23)
        ref_head = ref.TSNClsHead(
            spatial_type='avg', spatial_size=-1,
            consensus_cfg=dict(type='TRNmultiscale', num_frames=self.NF),
            dropout_ratio=0.0, in_channels=in_ch, num_classes=NUM_CLASSES)
        # the corrected consensus (256 = new_fc output dim)
        fixed_trn = ref_rc.RelationModuleMultiScale(
            256, self.NF, NUM_CLASSES).double()
        ref_head = ref_head.double()

        ours = TSNClsHead(
            spatial_type='avg', spatial_size=-1,
            consensus_cfg=dict(type='TRNmultiscale', num_frames=self.NF),
            dropout_ratio=0.0, in_channels=in_ch, num_classes=NUM_CLASSES,
            dtype=None)
        x0 = jnp.zeros((2 * self.NF, 7, 7, in_ch), jnp.float64)
        head_vars = ours.init(jax.random.PRNGKey(0), x0, self.NF)
        # the importer speaks recognizer-level paths; wrap/unwrap head_mod
        wrapped = {'params': {'head_mod': head_vars['params']}}
        sd = {f'cls_head.new_fc.{k}': v.detach().numpy()
              for k, v in ref_head.new_fc.state_dict().items()}
        sd.update({f'cls_head.segmental_consensus.{k}': v.detach().numpy()
                   for k, v in fixed_trn.state_dict().items()})
        wrapped, report = import_torch_weights(sd, wrapped,
                                               return_report=True)
        assert not report['unexpected'] and not report['missing']
        variables = {'params': wrapped['params']['head_mod']}

        picks = [np.array([1, 3, 0]), np.array([4, 2, 0])]
        monkeypatch.setattr(ref_rc.np.random, 'choice',
                            _ScriptedChoice(picks))
        scripted = iter([p.astype(np.int32) for p in picks])
        monkeypatch.setattr(consensus_mod, '_deterministic_pick',
                            lambda n, k: next(scripted))

        rng = np.random.RandomState(6)
        x = rng.randn(2 * self.NF, 7, 7, in_ch)
        # reference side, composed per the evident intent
        with torch.no_grad():
            feat = torch.from_numpy(x.mean(axis=(1, 2)))  # spatial avg pool
            emb = ref_head.new_fc(feat).view(-1, self.NF, 256)
            out_t = fixed_trn(emb)
        out_j = ours.apply(variables, jnp.asarray(x), self.NF)
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                                   rtol=1e-9, atol=1e-12)
