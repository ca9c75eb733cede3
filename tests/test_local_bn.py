"""Per-replica (non-synced) BatchNorm training semantics.

The reference trains with per-GPU batch statistics (plain ``nn.BatchNorm``
built per replica, ``/root/reference/codes/models/backbones/resnet.py:496-527``,
DDP averaging only gradients). ``make_train_step(local_bn=True)`` reproduces
this with ``jax.shard_map``: these tests pin the invariant that the sharded
step equals an explicit per-shard computation — each shard normalized by its
own statistics, gradients and EMAs averaged — and that it differs from the
default global-batch (SyncBN) statistics when shards are heterogeneous.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvfnet_tpu.engine.optim import build_lr_schedule, build_optimizer
from mvfnet_tpu.engine.train_step import TrainState, make_train_step
from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch

N_DEV = 8
CLIP = 2
NUM_CLASSES = 5


def _model():
    return build_recognizer(
        dict(type='Recognizer2D',
             backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                           norm_eval=False,
                           norm_cfg=dict(type='BN', requires_grad=True)),
             cls_head=dict(type='TSNClsHead', spatial_size=-1,
                           spatial_type='avg', dropout_ratio=0.0,
                           in_channels=512, init_std=0.01,
                           num_classes=NUM_CLASSES),
             module_cfg=dict(type='MVF', n_segment=CLIP, alpha=0.125,
                             mvf_freq=(0, 0, 1, 1), mode='THW')),
        train_cfg=dict(), test_cfg=dict(average_clips='prob'))


def _setup():
    if len(jax.devices()) < N_DEV:
        pytest.skip('needs 8 virtual devices')
    model = _model()
    rng = np.random.RandomState(0)
    # heterogeneous shards: shard i's pixels are drawn around mean i
    imgs = np.stack([
        rng.randn(CLIP, 32, 32, 3).astype(np.float32) + i
        for i in range(N_DEV)])
    labels = np.arange(N_DEV, dtype=np.int32) % NUM_CLASSES
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:1]),
                           jnp.asarray(labels[:1]), return_loss=True,
                           train=False)
    sched = build_lr_schedule(dict(policy='step', step=[10]), 0.05,
                              iters_per_epoch=10, total_epochs=20)
    tx = build_optimizer(variables['params'],
                         dict(type='SGD', lr=0.05, momentum=0.9,
                              weight_decay=1e-4, nesterov=True), sched)
    return model, variables, tx, imgs, labels


def _loss_fn(model, params, batch_stats, imgs, labels, rng):
    losses, new_state = model.apply(
        {'params': params, 'batch_stats': batch_stats},
        imgs, labels, return_loss=True, train=True,
        rngs={'dropout': rng}, mutable=['batch_stats'])
    total = sum(v for k, v in losses.items() if 'loss' in k)
    return total, new_state['batch_stats']


class TestLocalBN:

    def test_matches_explicit_per_shard_computation(self):
        """local_bn sharded step == per-shard grads/stats averaged by hand."""
        model, variables, tx, imgs, labels = _setup()
        mesh = make_mesh(jax.devices()[:N_DEV])
        step = make_train_step(model, tx, mesh=mesh, local_bn=True,
                               donate=False)
        state0 = TrainState.create(variables, tx)
        rng = jax.random.PRNGKey(7)
        batch = shard_batch({'img_group': imgs, 'label': labels}, mesh)
        state1, metrics = step(replicate(state0, mesh),
                               batch['img_group'], batch['label'], rng)

        # oracle: each shard independently, with its own BN stats and its
        # own dropout stream (fold_in(step-rng, shard_index))
        step_rng = jax.random.fold_in(rng, 0)
        grad_fn = jax.value_and_grad(
            lambda p, bs, im, lb, r: _loss_fn(model, p, bs, im, lb, r),
            has_aux=True)
        totals, stats, grads = [], [], []
        for i in range(N_DEV):
            (total, new_bs), g = grad_fn(
                state0.params, state0.batch_stats,
                jnp.asarray(imgs[i:i + 1]), jnp.asarray(labels[i:i + 1]),
                jax.random.fold_in(step_rng, i))
            totals.append(total)
            stats.append(new_bs)
            grads.append(g)
        mean = lambda *ts: sum(ts) / len(ts)  # noqa: E731
        g_mean = jax.tree_util.tree_map(mean, *grads)
        bs_mean = jax.tree_util.tree_map(mean, *stats)
        loss_mean = float(np.mean([float(t) for t in totals]))

        # Tolerances: f32 gradients of this net differ by up to ~5% (on the
        # max element) between *compilations of the same function* (jit vs
        # eager measured); the assertions below are calibrated to catch
        # semantic errors (psum-vs-pmean factors, global-vs-local stats),
        # not reduction-order noise.
        assert np.isclose(float(np.asarray(metrics['loss'])), loss_mean,
                          rtol=1e-3, atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(state1.batch_stats),
                        jax.tree_util.tree_leaves(bs_mean)):
            # reduction-order noise between pmean and the python-loop mean
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)
        # params after the step == manual averaged-grad SGD update, compared
        # per-leaf as ||dp_sharded - dp_manual|| / ||dp_manual||: semantic
        # bugs (e.g. grads summed instead of averaged -> 8x updates) give
        # ratios ~7, compilation noise stays well under 0.25
        updates, _ = tx.update(g_mean, state0.opt_state, state0.params)
        import optax
        p_manual = optax.apply_updates(state0.params, updates)
        tot_err2 = tot_ref2 = 0.0
        for (kp, a), (_, b), (_, p0) in zip(
                jax.tree_util.tree_flatten_with_path(state1.params)[0],
                jax.tree_util.tree_flatten_with_path(p_manual)[0],
                jax.tree_util.tree_flatten_with_path(state0.params)[0]):
            da = np.asarray(a) - np.asarray(p0)
            db = np.asarray(b) - np.asarray(p0)
            err = np.linalg.norm(da - db)
            ref = np.linalg.norm(db)
            tot_err2 += float(err) ** 2
            tot_ref2 += float(ref) ** 2
            # per-leaf noise measured up to 0.29 (same leaf, jit vs eager)
            assert err <= 0.6 * ref + 1e-7, (
                jax.tree_util.keystr(kp), err, ref)
        # global scale: grads-summed-not-averaged would give ratio ~7
        assert np.sqrt(tot_err2 / tot_ref2) < 0.3, (tot_err2, tot_ref2)

    def test_differs_from_synced_bn_on_heterogeneous_shards(self):
        """Per-shard statistics must actually change the computation."""
        model, variables, tx, imgs, labels = _setup()
        mesh = make_mesh(jax.devices()[:N_DEV])
        rng = jax.random.PRNGKey(7)
        batch = shard_batch({'img_group': imgs, 'label': labels}, mesh)
        losses = {}
        for flag in (False, True):
            step = make_train_step(model, tx, mesh=mesh, local_bn=flag,
                                   donate=False)
            state0 = replicate(TrainState.create(variables, tx), mesh)
            _, metrics = step(state0, batch['img_group'], batch['label'],
                              rng)
            losses[flag] = float(np.asarray(metrics['loss']))
        assert np.isfinite(losses[True]) and np.isfinite(losses[False])
        assert abs(losses[True] - losses[False]) > 1e-4, losses

    def test_local_bn_requires_mesh(self):
        model, variables, tx, _, _ = _setup()
        with pytest.raises(ValueError):
            make_train_step(model, tx, mesh=None, local_bn=True)


class TestLocalBNTrainLoop:
    def test_cfg_flag_wires_into_loop(self, tmp_path):
        """Top-level `local_bn = True` in the config reaches the compiled
        step and trains (finite loss) on a 2-device mesh."""
        import cv2
        import os
        from test_engine import tiny_cfg
        from mvfnet_tpu.data import build_dataset
        from mvfnet_tpu.engine import TrainLoop
        from mvfnet_tpu.models import build_recognizer
        from mvfnet_tpu.parallel import make_mesh

        root = tmp_path / 'data'
        root.mkdir()
        rng = np.random.RandomState(5)
        lines = []
        for v in range(4):
            d = root / f'v{v}'
            d.mkdir()
            for f in range(8):
                cv2.imwrite(str(d / f'img_{f + 1:05}.jpg'),
                            rng.randint(0, 255, (48, 48, 3), np.uint8))
            lines.append(f'v{v} 8 {v % 2}')
        ann = root / 'ann.txt'
        ann.write_text('\n'.join(lines) + '\n')

        cfg = tiny_cfg(root, ann, total_epochs=1)
        cfg.local_bn = True
        cfg.work_dir = str(tmp_path / 'work')
        model = build_recognizer(dict(cfg.model), test_cfg=dict(cfg.test_cfg))
        dataset = build_dataset(dict(cfg.data['train']))
        mesh = make_mesh(jax.devices()[:2])
        loop = TrainLoop(model, dataset, cfg, work_dir=cfg.work_dir,
                         mesh=mesh)
        state = loop.run()
        assert int(state.step) == 1
        assert os.path.exists(cfg.work_dir)
