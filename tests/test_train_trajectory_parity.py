"""Multi-step train-trajectory parity vs a hand-written torch loop.

The strongest training-semantics evidence available without K400 data:
N full train steps of the real R50+MVF recognizer driven through
``engine/train_step.py`` must reproduce, in float64, the composed
reference semantics step by step — same losses, same final parameters,
same BN running statistics. Composed pieces (each already unit-tested in
isolation; this pins their interaction):

- batch_processor cross-entropy + parse_losses
  (reference ``codes/core/train.py:52-77``)
- grad clip by global norm then SGD step
  (reference ``codes/core/dist_utils.py:52-67`` OptimizerHook)
- torch SGD with coupled weight decay + nesterov momentum
- paramwise options incl. the norm-regex quirk: downsample BN is NOT a
  norm param (reference ``codes/core/train.py:143`` regex misses
  ``downsample.1.*``)
- mmcv linear warmup + step LR applied per iteration
- train-mode BatchNorm (batch stats in forward, momentum-0.1 running
  stats), both 2-D BN and the MVF module's BN3d

Both loops run from identical imported weights on identical data. The
torch loop is written directly from the reference files above, not from
our engine. Dropout is disabled (ratio 0) — RNG streams cannot be
matched across frameworks; dropout math needs no parity evidence.

Tolerances (float64, documented in COVERAGE.md): per-step losses to
rtol 1e-9, final params/batch-stats to rtol 1e-7 / atol 1e-9. fp64 conv
reduction-order noise is ~1e-13 per step; 6 steps of SGD amplify it only
linearly, so anything beyond ~1e-10 would indicate a real semantics bug.
"""

import re

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

from torch_oracle import TorchMVFNetR50, export_reference_style_state_dict

NUM_CLASSES = 8
T = 2          # segments
B = 2          # videos per step
N_STEPS = 6
HW = 64
BASE_LR = 0.02
MAX_NORM = 2.0
WARMUP_ITERS = 3
MILESTONE = 5  # iteration index where step-decay kicks in


def flax_cfg():
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
        dtype=None,  # follow input/param dtype (float64 here)
    )


def build_torch_optimizer(model, lr, momentum, weight_decay, nesterov,
                          paramwise_options=None):
    """The reference's build_optimizer (``codes/core/train.py:79-156``),
    including the norm regex ``(bn|gn)(\\d+)?.(weight|bias)``."""
    if paramwise_options is None:
        return torch.optim.SGD(model.parameters(), lr=lr, momentum=momentum,
                               weight_decay=weight_decay, nesterov=nesterov)
    bias_lr_mult = paramwise_options.get('bias_lr_mult', 1.)
    bias_decay_mult = paramwise_options.get('bias_decay_mult', 1.)
    norm_decay_mult = paramwise_options.get('norm_decay_mult', 1.)
    params = []
    for name, param in model.named_parameters():
        group = {'params': [param]}
        if re.search(r'(bn|gn)(\d+)?.(weight|bias)', name):
            group['weight_decay'] = weight_decay * norm_decay_mult
        elif name.endswith('.bias'):
            group['lr'] = lr * bias_lr_mult
            group['weight_decay'] = weight_decay * bias_decay_mult
        params.append(group)
    return torch.optim.SGD(params, lr=lr, momentum=momentum,
                           weight_decay=weight_decay, nesterov=nesterov)


def mmcv_lr_factor(t, milestones, warmup_iters, warmup_ratio=0.1,
                   gamma=0.1):
    """mmcv LrUpdaterHook factor (warmup + step), relative to base lr.

    Computed DIRECTLY from the mmcv formula (StepLrUpdaterHook regular lr
    ``gamma ** #milestones<=t`` then ``get_warmup_lr``:
    ``regular * (1 - (1 - t/warmup_iters) * (1 - warmup_ratio))`` while
    ``t < warmup_iters``), deliberately NOT via the repo's own
    make_step_lr_schedule so the torch side of the trajectory test is an
    independent oracle for the LR semantics too (advisor finding, r4)."""
    f = gamma ** sum(1 for m in milestones if t >= m)
    if t < warmup_iters:
        k = (1 - t / warmup_iters) * (1 - warmup_ratio)
        f *= (1 - k)
    return f


def lr_factor(t):
    return mmcv_lr_factor(t, [MILESTONE], WARMUP_ITERS)


def torch_train_loop(oracle, opt, imgs, labels):
    """Reference train loop: per-iter LR set (mmcv LrUpdaterHook), forward
    CE, backward, clip_grad_norm_, SGD step."""
    base_lrs = [g['lr'] for g in opt.param_groups]
    oracle.train()
    losses = []
    for t in range(N_STEPS):
        f = lr_factor(t)
        for g, lr0 in zip(opt.param_groups, base_lrs):
            g['lr'] = lr0 * f
        x = torch.from_numpy(
            imgs[t].reshape(B * T, HW, HW, 3).transpose(0, 3, 1, 2))
        y = torch.from_numpy(labels[t])
        opt.zero_grad()
        loss = F.cross_entropy(oracle(x), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(oracle.parameters(), MAX_NORM)
        opt.step()
        losses.append(loss.item())
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


@pytest.fixture(scope='module')
def f64():
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', False)


@pytest.fixture(scope='module')
def data():
    rng = np.random.RandomState(7)
    imgs = rng.randn(N_STEPS, B, T, HW, HW, 3).astype(np.float64) * 0.5
    labels = rng.randint(0, NUM_CLASSES, size=(N_STEPS, B)).astype(np.int64)
    return imgs, labels


def _fresh_oracle(seed):
    torch.manual_seed(seed)
    oracle = TorchMVFNetR50(num_classes=NUM_CLASSES, n_segment=T)
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    return oracle.double()


def _import_into_flax(oracle):
    model = build_recognizer(flax_cfg(), test_cfg=dict(average_clips=None))
    imgs0 = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'dropout': jax.random.PRNGKey(1)},
        imgs0, jnp.zeros((1,), jnp.int32), return_loss=True, train=True)
    sd = {k: v.numpy() for k, v in
          export_reference_style_state_dict(oracle).items()}
    # cast BEFORE import: the importer casts to the target leaf dtype, so an
    # f32 target would round the f64 oracle weights (a ~1e-7 initial error
    # that the trajectory then amplifies past tolerance)
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64), variables)
    return import_torch_weights(sd, variables)


def _assert_final_state_matches(oracle, state):
    """Map the torch loop's final weights into the flax tree through the
    (independently tested) importer and compare the whole trees."""
    model = build_recognizer(flax_cfg(), test_cfg=dict(average_clips=None))
    del model
    sd = {k: v.numpy() for k, v in
          export_reference_style_state_dict(oracle).items()}
    ref_vars = import_torch_weights(sd, state.variables())
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_vars)
    flat_ours = dict(
        ('/'.join(str(p) for p in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            state.variables()))
    assert flat_ref, 'empty reference tree'
    for path, ref_leaf in flat_ref:
        key = '/'.join(str(p) for p in path)
        np.testing.assert_allclose(
            np.asarray(flat_ours[key]), np.asarray(ref_leaf),
            rtol=1e-7, atol=1e-9, err_msg=key)


class TestTrainTrajectoryParity:
    def test_k400_recipe_trajectory(self, f64, data):
        """The shipped recipe's semantics: SGD(momentum .9, wd 1e-4,
        nesterov) + clip 40->2 + warmup/step LR + train-mode BN,
        6 steps spanning warmup, full-lr, and post-milestone decay."""
        imgs, labels = data
        oracle = _fresh_oracle(0)
        variables = _import_into_flax(oracle)

        opt = build_torch_optimizer(oracle, BASE_LR, 0.9, 1e-4, True)
        ref_losses = torch_train_loop(oracle, opt, imgs, labels)

        cfg = dict(type='SGD', lr=BASE_LR, momentum=0.9, weight_decay=1e-4,
                   nesterov=True)
        state, losses = jax_train_loop(variables, cfg, imgs, labels)

        np.testing.assert_allclose(losses, ref_losses, rtol=1e-9)
        assert losses[0] != losses[-1]  # the trajectory actually moved
        _assert_final_state_matches(oracle, state)

    def test_paramwise_trajectory(self, f64, data):
        """Paramwise options composed into the same loop: norm_decay_mult=0
        (with the downsample-BN regex quirk), bias_lr_mult=2,
        bias_decay_mult=0."""
        imgs, labels = data
        oracle = _fresh_oracle(1)
        variables = _import_into_flax(oracle)
        pw = dict(norm_decay_mult=0.0, bias_lr_mult=2.0, bias_decay_mult=0.0)

        opt = build_torch_optimizer(oracle, BASE_LR, 0.9, 1e-4, True,
                                    paramwise_options=pw)
        ref_losses = torch_train_loop(oracle, opt, imgs, labels)

        cfg = dict(type='SGD', lr=BASE_LR, momentum=0.9, weight_decay=1e-4,
                   nesterov=True, paramwise_options=pw)
        state, losses = jax_train_loop(variables, cfg, imgs, labels)

        np.testing.assert_allclose(losses, ref_losses, rtol=1e-9)
        _assert_final_state_matches(oracle, state)


# ---------------------------------------------------------------------------
# 3-D family: I3D-R50 (the verdict's "and one 3-D family")
# ---------------------------------------------------------------------------

I3D_T = 8       # frames per clip
# HW=64, NOT smaller: at 32^2 the layer-4 maps collapse to 1x1x1 and
# train-mode BN normalizes over count=2, where 1/sqrt(var+eps) amplifies
# f64 reduction noise ~300x per BN — stages 0-2 agreed to 1e-13 while
# stage 3 blew up to 2.5e-6 (ill-conditioned test geometry, not a
# semantics bug; instrumented in round 4). 64^2 keeps 2x2 spatial maps.
I3D_HW = 64
I3D_STEPS = 4
I3D_MILESTONE = 3  # decay right after warmup so 4 steps cover all regimes


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
        dtype=None,
    )


class TestI3DTrajectoryParity:
    def test_i3d_recipe_trajectory(self, f64):
        """4 composed train steps of the real I3D-R50 recognizer vs the
        torch loop — the 3-D conv/BN/pool2 train semantics under the same
        SGD+clip+warmup/step-LR recipe."""
        from torch_oracle import TorchI3DR50, export_i3d_state_dict

        rng = np.random.RandomState(11)
        imgs = rng.randn(I3D_STEPS, B, 1, I3D_T, I3D_HW, I3D_HW,
                         3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES,
                             size=(I3D_STEPS, B)).astype(np.int64)

        torch.manual_seed(2)
        oracle = TorchI3DR50(num_classes=NUM_CLASSES)
        with torch.no_grad():
            for m in oracle.modules():
                if isinstance(m, torch.nn.BatchNorm3d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
        oracle = oracle.double()

        model = build_recognizer(i3d_flax_cfg(),
                                 test_cfg=dict(average_clips=None))
        imgs0 = jnp.zeros((1, 1, I3D_T, I3D_HW, I3D_HW, 3), jnp.float32)
        variables = model.init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(1)},
            imgs0, jnp.zeros((1,), jnp.int32), return_loss=True, train=True)
        variables = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), variables)
        sd = {k: v.numpy() for k, v in export_i3d_state_dict(oracle).items()}
        variables = import_torch_weights(sd, variables)

        sched = make_step_lr_schedule(
            BASE_LR, [I3D_MILESTONE], iters_per_epoch=1, warmup='linear',
            warmup_iters=WARMUP_ITERS, warmup_ratio=0.1)
        opt = build_torch_optimizer(oracle, BASE_LR, 0.9, 1e-4, True)
        base_lrs = [g['lr'] for g in opt.param_groups]
        oracle.train()
        ref_losses = []
        import torch.nn.functional as F
        for t in range(I3D_STEPS):
            f = mmcv_lr_factor(t, [I3D_MILESTONE], WARMUP_ITERS)
            for g, lr0 in zip(opt.param_groups, base_lrs):
                g['lr'] = lr0 * f
            # (B, 1, T, H, W, 3) -> (B, 3, T, H, W)
            x = torch.from_numpy(
                imgs[t].reshape(B, I3D_T, I3D_HW, I3D_HW, 3)
                .transpose(0, 4, 1, 2, 3))
            y = torch.from_numpy(labels[t])
            opt.zero_grad()
            loss = F.cross_entropy(oracle(x), y)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(oracle.parameters(), MAX_NORM)
            opt.step()
            ref_losses.append(loss.item())

        cfg = dict(type='SGD', lr=BASE_LR, momentum=0.9, weight_decay=1e-4,
                   nesterov=True)
        tx = build_optimizer(variables['params'], cfg, sched,
                             grad_clip=dict(max_norm=MAX_NORM, norm_type=2))
        step_fn = make_train_step(model, tx, mesh=None, donate=False)
        state = TrainState.create(variables, tx)
        key = jax.random.PRNGKey(0)
        losses = []
        for t in range(I3D_STEPS):
            state, metrics = step_fn(state, jnp.asarray(imgs[t]),
                                     jnp.asarray(labels[t]), key)
            losses.append(float(metrics['loss']))

        np.testing.assert_allclose(losses, ref_losses, rtol=1e-9)
        # final params through the importer, whole-tree compare
        sd = {k: v.numpy() for k, v in export_i3d_state_dict(oracle).items()}
        ref_vars = import_torch_weights(sd, state.variables())
        flat_ours = dict(
            ('/'.join(str(p) for p in path), leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                state.variables()))
        for path, ref_leaf in jax.tree_util.tree_leaves_with_path(ref_vars):
            k = '/'.join(str(p) for p in path)
            np.testing.assert_allclose(
                np.asarray(flat_ours[k]), np.asarray(ref_leaf),
                rtol=1e-7, atol=1e-9, err_msg=k)
