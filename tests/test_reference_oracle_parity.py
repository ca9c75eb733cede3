"""Authentic-oracle parity: the ACTUAL reference code executes as the oracle.

Round-4 verdict, top item. All previous torch-parity evidence routed through
``tests/torch_oracle.py`` — a from-scratch re-implementation — so a shared
misreading of the reference would be invisible. Here the reference repo's
own source (loaded byte-identical via tests/reference_loader.py under torch
CPU) is the oracle, pinning three layers:

(a) torch_oracle == reference code: forward loss, every gradient, and BN
    running stats after a train-mode step
    (``/root/reference/codes/models/recognizers/recognizer2d.py:132-148``,
    ``backbones/resnet.py``, ``modules/MVF.py``, ``heads/tsn_clshead.py``)
(b) JAX model == reference code on the same weights: train-mode loss,
    eval consensus scores, and the fcn_testing dense path incl. softmax
    clip averaging (``recognizer2d.py:151-179``, ``tsn_clshead.py:99-117``,
    ``recognizers/base.py:43-74``)
(c) composed f64 train trajectory vs the reference's OWN
    ``build_optimizer`` (``codes/core/train.py:79-156``) and
    ``batch_processor``/``parse_losses`` (``train.py:32-60``), both the
    plain obj_from_dict path and the paramwise path with the norm-regex
    downsample quirk; per-iteration LR factors computed independently from
    the mmcv formula.

All comparisons in float64. Tolerances as in
tests/test_train_trajectory_parity.py (loss rtol 1e-9, params rtol
1e-7/atol 1e-9); (a) is torch-vs-torch of identical math so it gets
tighter bounds (loss rtol 1e-12; grads/buffers ~1e-9 — pooling/reshape
order differs between the two graphs, measured f64 reduction noise is
~1e-10 relative).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mvfnet_tpu.engine.optim import build_optimizer, make_step_lr_schedule
from mvfnet_tpu.engine.train_step import TrainState, make_train_step
from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.utils.checkpoint import import_torch_weights

from reference_loader import load_reference
from test_train_trajectory_parity import mmcv_lr_factor
from torch_oracle import TorchMVFNetR50, export_reference_style_state_dict

NUM_CLASSES = 8
T = 2          # segments per clip
B = 2          # videos per train step
HW = 64
BASE_LR = 0.02
MAX_NORM = 2.0
N_STEPS = 4
WARMUP_ITERS = 2
MILESTONE = 3  # decay inside the 4-step window: warmup/full/decayed covered


def ref_model_cfg(fcn=False):
    """The R50+MVF recognizer cfg in the reference's own vocabulary
    (mirrors ``configs/MVFNet/K400/mvf_kinetics400_2d_rgb_r50_dense.py:14-47``
    at test scale). Fresh dicts each call — the reference's
    ``_prepare_base_model`` pops ``module_cfg['type']`` in place."""
    return dict(
        type='Recognizer2D',
        backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                      norm_eval=False,
                      norm_cfg=dict(type='BN', requires_grad=True)),
        cls_head=dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                      dropout_ratio=0.0, in_channels=2048, init_std=0.01,
                      num_classes=NUM_CLASSES, fcn_testing=fcn),
        module_cfg=dict(type='MVF', n_segment=T, alpha=0.125,
                        mvf_freq=(0, 0, 1, 1), mode='THW'),
        fcn_testing=fcn,
    )


def flax_cfg(fcn=False):
    return dict(
        type='Recognizer2D',
        backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                      norm_eval=False,
                      norm_cfg=dict(type='BN', requires_grad=True)),
        cls_head=dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                      dropout_ratio=0.0, in_channels=2048, init_std=0.01,
                      num_classes=NUM_CLASSES),
        module_cfg=dict(type='MVF', n_segment=T, alpha=0.125,
                        mvf_freq=(0, 0, 1, 1), mode='THW'),
        fcn_testing=fcn,
        dtype=None,  # follow input/param dtype (float64 here)
    )


def build_reference_model(ref, seed, fcn=False, average_clips=None):
    """Build + seed the reference Recognizer2D in f64 with exercised
    (non-trivial) BN running stats."""
    torch.manual_seed(seed)
    model = ref.build_recognizer(ref_model_cfg(fcn), train_cfg=None,
                                 test_cfg=dict(average_clips=average_clips))
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    return model.double()


def import_reference_weights_into_flax(ref_model, fcn=False):
    """Reference state_dict -> flax variables through the (independently
    tested) importer; the reference vocabulary IS the checkpoint
    vocabulary, no renaming step."""
    model = build_recognizer(flax_cfg(fcn),
                             test_cfg=dict(average_clips='prob' if fcn
                                           else None))
    imgs0 = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        imgs0, jnp.zeros((1,), jnp.int32), return_loss=True, train=True)
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64), variables)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return model, import_torch_weights(sd, variables)


@pytest.fixture(scope='module')
def f64():
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', False)


@pytest.fixture(scope='module')
def ref():
    return load_reference()


@pytest.fixture(scope='module')
def data():
    rng = np.random.RandomState(7)
    imgs = rng.randn(N_STEPS, B, T, HW, HW, 3).astype(np.float64) * 0.5
    labels = rng.randint(0, NUM_CLASSES, size=(N_STEPS, B)).astype(np.int64)
    return imgs, labels


# ---------------------------------------------------------------------------
# (a) torch_oracle vs the reference code itself
# ---------------------------------------------------------------------------

class TestOracleVsReferenceCode:
    def test_forward_backward_and_bn_stats(self, ref, data):
        """The hand-written oracle and the real reference code must agree on
        loss, every gradient, and post-step BN running stats when given
        identical weights — this validates the oracle that all other
        torch-parity tests in the repo route through."""
        imgs, labels = data
        torch.manual_seed(0)
        oracle = TorchMVFNetR50(num_classes=NUM_CLASSES, n_segment=T)
        with torch.no_grad():
            for m in oracle.modules():
                if isinstance(m, (torch.nn.BatchNorm2d,
                                  torch.nn.BatchNorm3d)):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
        oracle = oracle.double()

        ref_model = build_reference_model(ref, 1)
        # strict load: also asserts the oracle's exported key vocabulary is
        # EXACTLY the reference model's state_dict vocabulary
        ref_model.load_state_dict(
            export_reference_style_state_dict(oracle), strict=True)

        oracle.train()
        ref_model.train()
        x4 = torch.from_numpy(
            imgs[0].reshape(B * T, HW, HW, 3).transpose(0, 3, 1, 2))
        x5 = x4.reshape(B, T, 3, HW, HW)
        y = torch.from_numpy(labels[0])

        loss_o = F.cross_entropy(oracle(x4), y)
        losses = ref_model(img_group=x5, label=y, return_loss=True)
        loss_r, log_vars = ref.parse_losses(losses)
        np.testing.assert_allclose(loss_o.item(), loss_r.item(), rtol=1e-12)
        assert log_vars['loss'] == pytest.approx(loss_r.item())

        loss_o.backward()
        loss_r.backward()
        ref_grads = {n: p.grad for n, p in ref_model.named_parameters()}
        n_checked = 0
        for n, p in oracle.named_parameters():
            rn = ('cls_head.' + n) if n.startswith('new_fc.') \
                else ('backbone.' + n)
            assert ref_grads[rn] is not None, rn
            # identical math, but pooling/reshape orders differ (oracle
            # .mean vs AdaptiveAvgPool2d): f64 reduction-order noise up to
            # ~1e-10 relative was measured; a semantics bug would be
            # orders of magnitude larger
            np.testing.assert_allclose(
                p.grad.numpy(), ref_grads[rn].numpy(),
                rtol=1e-9, atol=1e-12, err_msg=rn)
            n_checked += 1
        assert n_checked == len(ref_grads)

        # train-mode BN updated running stats identically on both sides
        ref_bufs = dict(ref_model.named_buffers())
        moved = 0
        for n, b in oracle.named_buffers():
            rn = 'backbone.' + n
            np.testing.assert_allclose(b.numpy(), ref_bufs[rn].numpy(),
                                       rtol=1e-10, atol=1e-15, err_msg=rn)
            if 'running_mean' in n and float(b.abs().sum()) > 0:
                moved += 1
        assert moved > 0


# ---------------------------------------------------------------------------
# (b) JAX model vs the reference code on imported weights
# ---------------------------------------------------------------------------

class TestJaxVsReferenceCode:
    def test_train_loss_and_eval_scores(self, f64, ref, data):
        imgs, labels = data
        ref_model = build_reference_model(ref, 2)
        model, variables = import_reference_weights_into_flax(ref_model)

        x5 = torch.from_numpy(
            imgs[0].reshape(B * T, HW, HW, 3).transpose(0, 3, 1, 2)
        ).reshape(B, T, 3, HW, HW)
        y = torch.from_numpy(labels[0])

        # eval consensus scores (average_clips=None path) FIRST — the
        # train-mode forward below updates torch running stats in place
        ref_model.eval()
        with torch.no_grad():
            ref_scores = ref_model(img_group=x5, label=None,
                                   return_loss=False, return_numpy=True)
        ours = model.apply(variables, jnp.asarray(imgs[0]), None,
                           return_loss=False)
        np.testing.assert_allclose(np.asarray(ours), ref_scores, rtol=1e-9,
                                   atol=1e-12)

        # train-mode loss
        ref_model.train()
        with torch.no_grad():
            losses = ref_model(img_group=x5, label=y, return_loss=True)
        our_losses, _ = model.apply(
            variables, jnp.asarray(imgs[0]), jnp.asarray(labels[0]),
            return_loss=True, train=True,
            rngs={'dropout': jax.random.PRNGKey(0)}, mutable=['batch_stats'])
        np.testing.assert_allclose(float(our_losses['loss_cls']),
                                   losses['loss_cls'].item(), rtol=1e-10)

    def test_fcn_dense_path(self, f64, ref):
        """The fcn_testing dense path against the reference's own
        ``forward_test`` (``recognizer2d.py:151-179``): view regrouping to
        3-D, 1x1x1-conv class map averaged over THW
        (``tsn_clshead.py:99-117``), softmax clip averaging
        (``base.py:70-73``). The lazily-created conv is pre-populated on
        CPU exactly as :101-110 would (sans the hard-coded ``.cuda()``)."""
        views = 6  # clips x crops
        ref_model = build_reference_model(ref, 3, fcn=True,
                                          average_clips='prob')
        # import BEFORE populating new_cls: once assigned, new_cls enters
        # state_dict() and would shadow new_fc in the importer
        model, variables = import_reference_weights_into_flax(ref_model,
                                                              fcn=True)
        head = ref_model.cls_head
        new_cls = torch.nn.Conv3d(head.in_channels, head.num_classes,
                                  1, 1, 0).double()
        new_cls.load_state_dict({
            'weight': head.new_fc.weight.detach()[:, :, None, None, None],
            'bias': head.new_fc.bias.detach()})
        head.new_cls = new_cls

        rng = np.random.RandomState(5)
        x = rng.randn(1, views * T, HW, HW, 3).astype(np.float64) * 0.5

        ref_model.eval()
        with torch.no_grad():
            ref_scores = ref_model(
                img_group=torch.from_numpy(x.transpose(0, 1, 4, 2, 3)),
                label=None, return_loss=False, return_numpy=True)
        assert ref_scores.shape == (1, NUM_CLASSES)

        ours = model.apply(variables, jnp.asarray(x), None,
                           return_loss=False)
        np.testing.assert_allclose(np.asarray(ours), ref_scores, rtol=1e-9,
                                   atol=1e-12)


# ---------------------------------------------------------------------------
# (c) composed train trajectory vs the reference's own optimizer builder
# ---------------------------------------------------------------------------

def reference_train_loop(ref, ref_model, opt, imgs, labels):
    """The reference hot loop, built from the reference's own pieces:
    mmcv per-iter LR set -> ``batch_processor`` (forward + parse_losses,
    ``train.py:32-60``) -> backward -> ``clip_grad_norm_`` -> step
    (``dist_utils.py:52-67``)."""
    base_lrs = [g['lr'] for g in opt.param_groups]
    ref_model.train()
    losses = []
    for t in range(N_STEPS):
        f = mmcv_lr_factor(t, [MILESTONE], WARMUP_ITERS)
        for g, lr0 in zip(opt.param_groups, base_lrs):
            g['lr'] = lr0 * f
        x = torch.from_numpy(
            imgs[t].reshape(B * T, HW, HW, 3).transpose(0, 3, 1, 2)
        ).reshape(B, T, 3, HW, HW)
        y = torch.from_numpy(labels[t])
        opt.zero_grad()
        outputs = ref.batch_processor(ref_model,
                                      dict(img_group=x, label=y),
                                      train_mode=True)
        outputs['loss'].backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), MAX_NORM)
        opt.step()
        losses.append(outputs['log_vars']['loss'])
    return losses


def jax_train_loop(variables, optimizer_cfg, imgs, labels):
    model = build_recognizer(flax_cfg(), test_cfg=dict(average_clips=None))
    sched = make_step_lr_schedule(
        BASE_LR, [MILESTONE], iters_per_epoch=1, warmup='linear',
        warmup_iters=WARMUP_ITERS, warmup_ratio=0.1)
    tx = build_optimizer(variables['params'], optimizer_cfg, sched,
                         grad_clip=dict(max_norm=MAX_NORM, norm_type=2))
    step_fn = make_train_step(model, tx, mesh=None, donate=False)
    state = TrainState.create(variables, tx)
    rng = jax.random.PRNGKey(0)
    losses = []
    for t in range(N_STEPS):
        state, metrics = step_fn(state, jnp.asarray(imgs[t]),
                                 jnp.asarray(labels[t]), rng)
        losses.append(float(metrics['loss']))
    return state, losses


def assert_final_state_matches(ref_model, state):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    ref_vars = import_torch_weights(sd, state.variables())
    flat_ours = dict(
        ('/'.join(str(p) for p in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            state.variables()))
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_vars)
    assert flat_ref
    for path, ref_leaf in flat_ref:
        key = '/'.join(str(p) for p in path)
        np.testing.assert_allclose(
            np.asarray(flat_ours[key]), np.asarray(ref_leaf),
            rtol=1e-7, atol=1e-9, err_msg=key)


class TestTrajectoryVsReferenceOptimizer:
    def test_plain_recipe(self, f64, ref, data):
        """The shipped K400 recipe's optimizer cfg goes through the
        reference's obj_from_dict path (``train.py:114-116``, no paramwise
        options — exactly as ``configs/...r50_dense.py:152-153``)."""
        imgs, labels = data
        ref_model = build_reference_model(ref, 4)
        model, variables = import_reference_weights_into_flax(ref_model)
        del model

        opt = ref.build_optimizer(
            ref_model, dict(type='SGD', lr=BASE_LR, momentum=0.9,
                            weight_decay=1e-4, nesterov=True))
        ref_losses = reference_train_loop(ref, ref_model, opt, imgs, labels)

        cfg = dict(type='SGD', lr=BASE_LR, momentum=0.9, weight_decay=1e-4,
                   nesterov=True)
        state, losses = jax_train_loop(variables, cfg, imgs, labels)

        np.testing.assert_allclose(losses, ref_losses, rtol=1e-9)
        assert losses[0] != losses[-1]
        assert_final_state_matches(ref_model, state)

    def test_paramwise_recipe(self, f64, ref, data):
        """The reference's paramwise branch (``train.py:118-156``) with its
        own norm regex — including the downsample-BN quirk — drives the
        torch side; our masked_labels/multi_transform must track it."""
        imgs, labels = data
        ref_model = build_reference_model(ref, 5)
        model, variables = import_reference_weights_into_flax(ref_model)
        del model
        pw = dict(norm_decay_mult=0.0, bias_lr_mult=2.0, bias_decay_mult=0.0)

        opt = ref.build_optimizer(
            ref_model, dict(type='SGD', lr=BASE_LR, momentum=0.9,
                            weight_decay=1e-4, nesterov=True,
                            paramwise_options=dict(pw)))
        assert len(opt.param_groups) > 1  # the paramwise path was taken
        ref_losses = reference_train_loop(ref, ref_model, opt, imgs, labels)

        cfg = dict(type='SGD', lr=BASE_LR, momentum=0.9, weight_decay=1e-4,
                   nesterov=True, paramwise_options=pw)
        state, losses = jax_train_loop(variables, cfg, imgs, labels)

        np.testing.assert_allclose(losses, ref_losses, rtol=1e-9)
        assert_final_state_matches(ref_model, state)


# ---------------------------------------------------------------------------
# 3-D family: the reference's ResNet_I3D + I3DClsHead as the oracle
# ---------------------------------------------------------------------------

I3D_T = 8


def i3d_ref_cfg():
    """The reference I3D-R50 recognizer (``resnet_i3d.py:498-530`` +
    ``i3d_clshead.py``, 3x1x1 inflation, (5,7,7) stem, pool2)."""
    return dict(
        type='Recognizer3D',
        backbone=dict(type='ResNet_I3D', depth=50, out_indices=(3,),
                      norm_eval=False, inflate_freq=(1, 1, 1, 1),
                      inflate_style='3x1x1', conv1_kernel=(5, 7, 7),
                      conv1_stride_t=2, pool1_stride_t=2,
                      nonlocal_stages=(-1,), nonlocal_cfg=None,
                      norm_cfg=dict(type='BN3d', requires_grad=True)),
        cls_head=dict(type='I3DClsHead', spatial_size=-1, temporal_size=-1,
                      dropout_ratio=0.0, in_channels=2048,
                      num_classes=NUM_CLASSES))


def i3d_flax_cfg():
    return dict(
        type='Recognizer3D',
        backbone=dict(type='ResNet_I3D', depth=50, out_indices=(3,),
                      norm_eval=False, inflate_freq=(1, 1, 1, 1),
                      inflate_style='3x1x1', conv1_kernel=(5, 7, 7),
                      conv1_stride_t=2, pool1_stride_t=2,
                      norm_cfg=dict(type='BN3d', requires_grad=True)),
        cls_head=dict(type='I3DClsHead', spatial_size=-1, temporal_size=-1,
                      dropout_ratio=0.0, in_channels=2048,
                      num_classes=NUM_CLASSES),
        dtype=None)


class TestI3DVsReferenceCode:
    def test_oracle_and_jax_match_reference(self, f64, ref):
        """(a) the TorchI3DR50 oracle == the reference's own ResNet_I3D
        stack (strict state-dict interchange, train-mode loss, all grads);
        (b) the JAX I3D == the reference code on the same weights (train
        loss + eval consensus scores)."""
        from torch_oracle import TorchI3DR50, export_i3d_state_dict

        torch.manual_seed(2)
        oracle = TorchI3DR50(num_classes=NUM_CLASSES)
        with torch.no_grad():
            for m in oracle.modules():
                if isinstance(m, torch.nn.BatchNorm3d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
        oracle = oracle.double()

        torch.manual_seed(3)
        ref_model = ref.build_recognizer(
            i3d_ref_cfg(), train_cfg=None,
            test_cfg=dict(average_clips=None))
        ref_model.load_state_dict(export_i3d_state_dict(oracle),
                                  strict=True)
        ref_model = ref_model.double()

        rng = np.random.RandomState(11)
        imgs = rng.randn(B, 1, I3D_T, HW, HW, 3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES, size=(B,)).astype(np.int64)
        # reference Recognizer3D wants [B, clips, C, T, H, W]
        x6 = torch.from_numpy(imgs.transpose(0, 1, 5, 2, 3, 4))
        y = torch.from_numpy(labels)

        # (a) oracle vs reference code: loss + grads
        oracle.train()
        ref_model.train()
        loss_o = F.cross_entropy(
            oracle(torch.from_numpy(
                imgs.reshape(B, I3D_T, HW, HW, 3)
                .transpose(0, 4, 1, 2, 3))), y)
        losses = ref_model(img_group=x6, label=y, return_loss=True)
        loss_r, _ = ref.parse_losses(losses)
        np.testing.assert_allclose(loss_o.item(), loss_r.item(), rtol=1e-12)
        loss_o.backward()
        loss_r.backward()
        ref_grads = {n: p.grad for n, p in ref_model.named_parameters()}
        for n, p in oracle.named_parameters():
            rn = ('cls_head.' + n) if n.startswith('fc_cls.') \
                else ('backbone.' + n)
            np.testing.assert_allclose(
                p.grad.numpy(), ref_grads[rn].numpy(),
                rtol=1e-9, atol=1e-12, err_msg=rn)

        # (b) JAX vs reference code on the post-step weights (eval path;
        # the train-mode forwards above already moved the BN buffers,
        # identically on both sides per the buffer checks in the 2-D test)
        model = build_recognizer(i3d_flax_cfg(),
                                 test_cfg=dict(average_clips=None))
        variables = model.init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(1)},
            jnp.zeros((1, 1, I3D_T, HW, HW, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32), return_loss=True, train=True)
        variables = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), variables)
        sd = {k: v.detach().numpy()
              for k, v in ref_model.state_dict().items()}
        variables = import_torch_weights(sd, variables)

        ref_model.eval()
        with torch.no_grad():
            ref_scores = ref_model(img_group=x6, label=None,
                                   return_loss=False, return_numpy=True)
        ours = model.apply(variables, jnp.asarray(imgs), None,
                           return_loss=False)
        np.testing.assert_allclose(np.asarray(ours), ref_scores,
                                   rtol=1e-9, atol=1e-12)

        # train-mode loss on the same weights
        ref_model.train()
        with torch.no_grad():
            losses = ref_model(img_group=x6, label=y, return_loss=True)
        our_losses, _ = model.apply(
            variables, jnp.asarray(imgs), jnp.asarray(labels),
            return_loss=True, train=True,
            rngs={'dropout': jax.random.PRNGKey(0)},
            mutable=['batch_stats'])
        np.testing.assert_allclose(float(our_losses['loss_cls']),
                                   losses['loss_cls'].item(), rtol=1e-10)
