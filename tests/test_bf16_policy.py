"""Evidence for the shipped bf16 training policy (round-4 verdict item 3).

The reference's fp16 subsystem (static loss-scale 512, fp32 master
weights, per-name casts — ``/root/reference/codes/core/fp16/hooks.py:12-97``)
was replaced by a dtype policy: params fp32, compute bf16, no loss
scaling. These tests replace the "no loss scaling needed" *assertion*
with measurements:

1. **Short-horizon trajectory coupling** — 6 train steps of the real
   R50+MVF recognizer on the trajectory-parity fixture (lr 0.02, clip 2.0,
   warmup+step LR), bf16 vs f32: per-step loss and grad-norm relative
   drift stay within bands set at ~2.5-3x the worst measured values
   (measured across runs/process histories: loss <= 9.8%, grad-norm
   <= 11.5%). Parameter-SPACE deviation is reported but NOT asserted:
   measured honestly it is O(1) and run-dependent on this fixture
   (1-step ratio up to 1.33, endpoint 0.15-1.35) because a random-init
   net on random labels has near-zero gradient signal — rounding noise
   dominates update direction while the scalar observables stay coupled.
   Params must remain fp32 throughout (the policy's master-weight half).
2. **End-task convergence** — the temporal-learning capstone
   (``tests/test_temporal_learning.py``) under the shipped bf16 policy:
   individual trajectories DIVERGE over many steps (measured: by step ~15
   at lr 0.05 the loss curves decouple entirely — the expected butterfly
   effect of any reduced-precision compute on a chaotic optimization, not
   a policy bug), but the optimization must still solve the task, under
   both the SyncBN default and ``local_bn=True`` per-shard BN.

Why no loss scaling: bf16 keeps fp32's 8 exponent bits, so gradients
cannot underflow the way fp16's 5-bit exponent does; scaling guards
against a failure mode bf16 does not have. The convergence test is the
operative check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvfnet_tpu.engine.optim import build_optimizer, make_step_lr_schedule
from mvfnet_tpu.engine.train_step import TrainState, make_train_step
from mvfnet_tpu.models import build_recognizer

NUM_CLASSES, T, B, HW, N_STEPS = 8, 2, 2, 64, 6


def _cfg(dtype):
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
        dtype=dtype)


def _run(dtype, imgs, labels):
    model = build_recognizer(_cfg(dtype), test_cfg=dict(average_clips=None))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, T, HW, HW, 3), jnp.float32),
                           jnp.zeros((1,), jnp.int32),
                           return_loss=True, train=False)
    sched = make_step_lr_schedule(0.02, [5], iters_per_epoch=1,
                                  warmup='linear', warmup_iters=3,
                                  warmup_ratio=0.1)
    tx = build_optimizer(variables['params'],
                         dict(type='SGD', lr=0.02, momentum=0.9,
                              weight_decay=1e-4, nesterov=True),
                         sched, grad_clip=dict(max_norm=2.0, norm_type=2))
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mesh=None, donate=False,
                           input_dtype=dtype)
    key = jax.random.PRNGKey(0)
    losses, gnorms, p_step1 = [], [], None
    for t in range(N_STEPS):
        state, m = step(state, jnp.asarray(imgs[t]),
                        jnp.asarray(labels[t]), key)
        losses.append(float(m['loss']))
        gnorms.append(float(m['grad_norm']))
        if t == 0:
            p_step1 = jax.device_get(state.params)
    return (np.array(losses), np.array(gnorms), variables['params'],
            p_step1, state.params)


class TestBf16TrajectoryCoupling:
    def test_bf16_tracks_f32_over_recipe_steps(self):
        rng = np.random.RandomState(7)
        imgs = rng.randn(N_STEPS, B, T, HW, HW, 3).astype(np.float32) * 0.5
        labels = rng.randint(0, NUM_CLASSES,
                             size=(N_STEPS, B)).astype(np.int32)

        l32, g32, p0, p32_1, p32 = _run(None, imgs, labels)
        lb, gb, _, pb_1, pb = _run(jnp.bfloat16, imgs, labels)

        # per-step loss drift: measured max 5.2% / 9.8% across runs and
        # process histories; band ~2.5x the worst measurement
        ld = np.abs(lb - l32) / np.maximum(np.abs(l32), 1e-6)
        assert ld.max() <= 0.25, f'bf16 loss drift {ld.tolist()}'
        # grad-norm drift: measured max 7.1% / 8.9% / 11.5% across runs
        gd = np.abs(gb - g32) / np.maximum(np.abs(g32), 1e-6)
        assert gd.max() <= 0.35, f'bf16 grad-norm drift {gd.tolist()}'

        # params remain fp32 (the policy's master-weight half: only
        # compute is bf16)
        dtypes = {np.asarray(v).dtype
                  for v in jax.tree_util.tree_leaves(pb)}
        assert dtypes == {np.dtype(np.float32)}, dtypes

        def flat(tree):
            return np.concatenate([np.asarray(v).ravel() for v in
                                   jax.tree_util.tree_leaves(tree)])

        # Parameter-SPACE deviation is REPORTED, not asserted. Measured
        # honestly on this fixture it is O(1) and run-dependent (1-step
        # ratio 1.33, 6-step endpoint 0.15-1.35 across process histories):
        # a random-init network under CE on random labels has near-zero
        # gradient signal, so reduced-precision rounding noise dominates
        # the update DIRECTION while scalar observables (loss, grad norm)
        # stay within ~10%. On a task with real signal the policy trains —
        # that is the operative check, the convergence capstone below.
        v0, v32_1, vb_1 = flat(p0), flat(p32_1), flat(pb_1)
        v32, vb = flat(p32), flat(pb)
        ratio1 = (np.linalg.norm(vb_1 - v32_1)
                  / np.linalg.norm(v32_1 - v0))
        ratio_n = np.linalg.norm(vb - v32) / np.linalg.norm(v32 - v0)
        print(f'\nbf16 drift: loss {ld.max():.4f} gnorm {gd.max():.4f} '
              f'1-step param ratio {ratio1:.4f} '
              f'{N_STEPS}-step endpoint ratio {ratio_n:.4f} (diagnostics)')

        # and the trajectory actually trained (warmup ramped LR, loss
        # moved): guards against a vacuous pass
        assert not np.allclose(v32, v0)


class TestBf16Capstone:
    def test_temporal_learning_under_bf16(self):
        """The motion-direction task (appearance-identical classes) is
        solved under the shipped bf16 policy — end-task evidence that
        unscaled bf16 gradients train the temporal pathway."""
        from test_temporal_learning import make_motion_batch
        from test_temporal_learning import T as MT, H as MH, W as MW

        model = build_recognizer(dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.0,
                          in_channels=512, init_std=0.01, num_classes=2),
            module_cfg=dict(type='MVF', n_segment=MT, alpha=0.25,
                            mvf_freq=(1, 1, 1, 1), mode='THW'),
            dtype=jnp.bfloat16),
            test_cfg=dict(average_clips=None))
        rng = np.random.RandomState(0)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, MT, MH, MW, 3), jnp.float32),
                               jnp.zeros((1,), jnp.int32),
                               return_loss=True, train=False)
        tx = build_optimizer(variables['params'],
                             dict(type='SGD', lr=0.05, momentum=0.9,
                                  weight_decay=1e-4, nesterov=True),
                             lambda s: 0.05,
                             grad_clip=dict(max_norm=40, norm_type=2))
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, mesh=None, donate=False,
                               input_dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(1)
        for i in range(90):
            imgs, labels = make_motion_batch(rng, 16)
            state, _ = step(state, jnp.asarray(imgs), jnp.asarray(labels),
                            key)
        eval_rng = np.random.RandomState(999)
        imgs, labels = make_motion_batch(eval_rng, 128)
        scores = model.apply(
            {'params': jax.device_get(state.params),
             'batch_stats': jax.device_get(state.batch_stats)},
            jnp.asarray(imgs), None, return_loss=False)
        acc = float((np.argmax(np.asarray(scores), 1) == labels).mean())
        assert acc >= 0.85, f'bf16 policy only reached {acc:.2f}'

    def test_temporal_learning_under_bf16_local_bn(self):
        """Same capstone with ``local_bn=True``: per-shard (reference
        per-GPU) BN statistics under bf16 compute on an 8-device mesh."""
        if len(jax.devices()) < 8:
            pytest.skip('needs 8 virtual devices')
        from jax.sharding import Mesh
        from test_temporal_learning import make_motion_batch
        from test_temporal_learning import T as MT, H as MH, W as MW

        mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
        model = build_recognizer(dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.0,
                          in_channels=512, init_std=0.01, num_classes=2),
            module_cfg=dict(type='MVF', n_segment=MT, alpha=0.25,
                            mvf_freq=(1, 1, 1, 1), mode='THW'),
            dtype=jnp.bfloat16),
            test_cfg=dict(average_clips=None))
        rng = np.random.RandomState(0)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, MT, MH, MW, 3), jnp.float32),
                               jnp.zeros((1,), jnp.int32),
                               return_loss=True, train=False)
        tx = build_optimizer(variables['params'],
                             dict(type='SGD', lr=0.05, momentum=0.9,
                                  weight_decay=1e-4, nesterov=True),
                             lambda s: 0.05,
                             grad_clip=dict(max_norm=40, norm_type=2))
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, mesh=mesh, donate=False,
                               input_dtype=jnp.bfloat16, local_bn=True)
        key = jax.random.PRNGKey(1)
        for i in range(90):
            imgs, labels = make_motion_batch(rng, 16)
            state, _ = step(state, jnp.asarray(imgs), jnp.asarray(labels),
                            key)
        eval_rng = np.random.RandomState(999)
        imgs, labels = make_motion_batch(eval_rng, 128)
        scores = model.apply(
            {'params': jax.device_get(state.params),
             'batch_stats': jax.device_get(state.batch_stats)},
            jnp.asarray(imgs), None, return_loss=False)
        acc = float((np.argmax(np.asarray(scores), 1) == labels).mean())
        assert acc >= 0.85, f'bf16+local_bn only reached {acc:.2f}'
