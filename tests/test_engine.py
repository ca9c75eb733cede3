"""Engine tests: SGD parity vs torch, LR schedule, train loop smoke with
checkpoint/resume, sharded train step on the 8-device CPU mesh."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from mvfnet_tpu.engine.optim import (build_lr_schedule, build_optimizer,
                                     make_step_lr_schedule, sgd_torch)


class TestSGDParity:
    def test_matches_torch_sgd_nesterov_wd(self):
        """Our optax chain must reproduce torch.optim.SGD exactly:
        coupled weight decay, momentum buffer, nesterov lookahead."""
        rng = np.random.RandomState(0)
        w0 = rng.randn(7, 5).astype(np.float32)
        grads = [rng.randn(7, 5).astype(np.float32) for _ in range(5)]
        lr, mom, wd = 0.05, 0.9, 1e-4

        wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch.optim.SGD([wt], lr=lr, momentum=mom, weight_decay=wd,
                              nesterov=True)
        for g in grads:
            opt.zero_grad()
            wt.grad = torch.from_numpy(g.copy())
            opt.step()

        tx = sgd_torch(lambda s: lr, momentum=mom, weight_decay=wd,
                       nesterov=True)
        params = {'w': jnp.asarray(w0)}
        state = tx.init(params)
        for g in grads:
            updates, state = tx.update({'w': jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params['w']),
                                   wt.detach().numpy(), rtol=1e-5, atol=1e-6)

    def test_grad_clip_matches_torch(self):
        rng = np.random.RandomState(1)
        w0 = rng.randn(4, 3).astype(np.float32)
        g = (rng.randn(4, 3) * 100).astype(np.float32)
        lr, max_norm = 0.1, 2.0

        wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch.optim.SGD([wt], lr=lr)
        wt.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([wt], max_norm)
        opt.step()

        from mvfnet_tpu.engine.optim import clip_by_global_norm_torch
        tx = optax.chain(clip_by_global_norm_torch(max_norm),
                         sgd_torch(lambda s: lr))
        params = {'w': jnp.asarray(w0)}
        state = tx.init(params)
        updates, state = tx.update({'w': jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        # torch-exact incl. the 1e-6 epsilon in the clip coefficient
        np.testing.assert_allclose(np.asarray(params['w']),
                                   wt.detach().numpy(), rtol=1e-6, atol=1e-7)


class TestLRSchedule:
    def test_mmcv_linear_warmup_and_step(self):
        """mmcv LrUpdater: warmup lr(t) = lr * (1 - (1-ratio)*(1 - t/W));
        step policy decays by gamma at epoch milestones."""
        base_lr, W = 0.015, 50
        sched = make_step_lr_schedule(base_lr, [9, 13], iters_per_epoch=10,
                                      warmup='linear', warmup_iters=W,
                                      warmup_ratio=0.01)
        assert float(sched(0)) == pytest.approx(base_lr * 0.01, rel=1e-4)
        assert float(sched(25)) == pytest.approx(
            base_lr * (1 - 0.5 * 0.99), rel=1e-4)
        assert float(sched(W)) == pytest.approx(base_lr, rel=1e-4)
        assert float(sched(89)) == pytest.approx(base_lr, rel=1e-4)
        assert float(sched(90)) == pytest.approx(base_lr * 0.1, rel=1e-4)
        assert float(sched(130)) == pytest.approx(base_lr * 0.01, rel=1e-4)

    def test_builder_step_policy(self):
        sched = build_lr_schedule(
            dict(policy='step', step=[2], warmup='linear', warmup_iters=5,
                 warmup_ratio=0.1),
            base_lr=1.0, iters_per_epoch=10, total_epochs=4)
        assert float(sched(0)) == pytest.approx(0.1, rel=1e-4)
        assert float(sched(10)) == pytest.approx(1.0, rel=1e-4)
        assert float(sched(25)) == pytest.approx(0.1, rel=1e-4)


class TestParamwiseAndFrozen:
    def test_norm_decay_and_frozen_masks(self):
        params = {
            'backbone_mod': {
                'conv1': {'kernel': jnp.ones((2, 2))},
                'bn1': {'scale': jnp.ones((2,)), 'bias': jnp.zeros((2,))},
                'layer1_0': {'conv1': {'kernel': jnp.ones((2, 2))}},
            },
            'head_mod': {'fc': {'kernel': jnp.ones((2, 2)),
                                'bias': jnp.zeros((2,))}},
        }
        lr = 1.0
        tx = build_optimizer(
            params,
            dict(type='SGD', lr=lr, momentum=0.0, weight_decay=0.5,
                 paramwise_options=dict(norm_decay_mult=0.0,
                                        bias_lr_mult=2.0)),
            lambda s: lr, grad_clip=None,
            frozen_prefixes=('backbone_mod/conv1',))
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        # frozen stem: zero update
        np.testing.assert_allclose(
            np.asarray(updates['backbone_mod']['conv1']['kernel']), 0.0)
        # norm scale: no weight decay -> update = -lr * grad = -1
        np.testing.assert_allclose(
            np.asarray(updates['backbone_mod']['bn1']['scale']), -1.0)
        # conv weight: wd coupled -> -(1 + 0.5*1) = -1.5
        np.testing.assert_allclose(
            np.asarray(updates['backbone_mod']['layer1_0']['conv1']['kernel']),
            -1.5)
        # fc bias: lr_mult 2, bias_decay default 1 -> -2*(1 + 0.5*0) = -2
        np.testing.assert_allclose(
            np.asarray(updates['head_mod']['fc']['bias']), -2.0)

    def test_downsample_bn_is_not_a_norm_param(self):
        """The reference's norm regex (train.py:143) misses the residual
        downsample's BN (torch name `downsample.1.*` has no 'bn'), so it
        keeps FULL weight decay under norm_decay_mult. We replicate that
        quirk: downsample_bn labels 'default'/'bias', not 'norm' (pinned
        by the composed trajectory test, test_train_trajectory_parity)."""
        from mvfnet_tpu.engine.optim import masked_labels
        params = {'backbone_mod': {'layer2_0': {
            'bn1': {'scale': jnp.ones((2,)), 'bias': jnp.zeros((2,))},
            'downsample_bn': {'scale': jnp.ones((2,)),
                              'bias': jnp.zeros((2,))},
        }}}
        labels = masked_labels(params)
        node = labels['backbone_mod']['layer2_0']
        assert node['bn1'] == {'scale': 'norm', 'bias': 'norm'}
        assert node['downsample_bn'] == {'scale': 'default', 'bias': 'bias'}


def tiny_cfg(tmp_root, ann, total_epochs=2):
    from mvfnet_tpu import Config
    cfg = Config(dict(
        model=dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=512, init_std=0.01, num_classes=2),
            module_cfg=dict(type='MVF', n_segment=2, alpha=0.25,
                            mvf_freq=(0, 0, 1, 1), mode='THW')),
        test_cfg=dict(average_clips='prob'),
        data=dict(
            videos_per_gpu=2, workers_per_gpu=2,
            train=dict(type='RawFramesDataset', ann_file=str(ann),
                       data_root=str(tmp_root),
                       pipeline=[
                           dict(type='SampleFrames', clip_len=2,
                                frame_interval=2, num_clips=1),
                           dict(type='FrameSelector'),
                           dict(type='RandomResizedCrop', input_size=32),
                           dict(type='Normalize',
                                mean=[123.675, 116.28, 103.53],
                                std=[58.395, 57.12, 57.375], to_rgb=True),
                           dict(type='FormatShape', input_format='NHWC'),
                           dict(type='Collect', keys=['img_group', 'label'],
                                meta_keys=[]),
                       ], test_mode=False, modality='RGB',
                       filename_tmpl='img_{:05}.jpg')),
        optimizer=dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=1e-4,
                       nesterov=True),
        optimizer_config=dict(grad_clip=dict(max_norm=40, norm_type=2)),
        lr_config=dict(policy='step', step=[1], warmup='linear',
                       warmup_iters=2, warmup_ratio=0.1),
        checkpoint_config=dict(interval=1),
        log_config=dict(interval=1),
        total_epochs=total_epochs,
        work_dir=None,
        log_level='INFO',
    ))
    return cfg


@pytest.fixture(scope='module')
def tiny_data(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('engine_data')
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
    return root, ann


class TestTrainLoopSmoke:
    def test_two_epochs_with_checkpoint_and_resume(self, tiny_data, tmp_path):
        from mvfnet_tpu.data import build_dataset
        from mvfnet_tpu.engine import (CheckpointHook, TextLoggerHook,
                                       TrainLoop)
        from mvfnet_tpu.models import build_recognizer
        from mvfnet_tpu.parallel import make_mesh

        root, ann = tiny_data
        cfg = tiny_cfg(root, ann)
        cfg.work_dir = str(tmp_path / 'work')
        model = build_recognizer(dict(cfg.model),
                                 test_cfg=dict(cfg.test_cfg))
        dataset = build_dataset(dict(cfg.data['train']))
        mesh = make_mesh(jax.devices()[:2])
        loop = TrainLoop(model, dataset, cfg, work_dir=cfg.work_dir,
                         mesh=mesh)
        # per-host batch scales with mesh size: 2 videos/chip x 2 chips = 4
        assert loop.loader.batch_size == 4
        loop.register_hook(TextLoggerHook(1))
        loop.register_hook(CheckpointHook(1))
        state = loop.run()
        assert int(state.step) == 2  # 2 epochs x 1 iter (4 videos/batch 4)
        assert os.path.exists(os.path.join(cfg.work_dir, 'latest.msgpack'))
        assert os.path.exists(os.path.join(cfg.work_dir, 'epoch_2.msgpack'))

        # resume from epoch-1 checkpoint and finish
        cfg2 = tiny_cfg(root, ann, total_epochs=2)
        cfg2.work_dir = str(tmp_path / 'work2')
        cfg2.resume_from = os.path.join(cfg.work_dir, 'epoch_1.msgpack')
        loop2 = TrainLoop(model, dataset, cfg2, work_dir=cfg2.work_dir,
                          mesh=mesh)
        assert loop2.epoch == 1
        assert int(loop2.state.step) == 1
        state2 = loop2.run()
        assert int(state2.step) == 2

    def test_loss_decreases_on_overfit(self, tiny_data, tmp_path):
        """Sanity: loss moves down when overfitting 4 videos."""
        from mvfnet_tpu.data import build_dataset
        from mvfnet_tpu.engine import Hook, TrainLoop
        from mvfnet_tpu.models import build_recognizer
        from mvfnet_tpu.parallel import make_mesh

        root, ann = tiny_data
        cfg = tiny_cfg(root, ann, total_epochs=6)
        cfg.optimizer['lr'] = 0.05
        cfg.lr_config = dict(policy='step', step=[100])
        cfg.work_dir = str(tmp_path / 'overfit')
        cfg.checkpoint_config = dict(interval=100)
        model = build_recognizer(dict(cfg.model),
                                 test_cfg=dict(cfg.test_cfg))
        dataset = build_dataset(dict(cfg.data['train']))

        losses = []

        class Collect(Hook):
            def after_iter(self, loop, metrics):
                losses.append(float(np.asarray(metrics['loss'])))

        loop = TrainLoop(model, dataset, cfg, work_dir=cfg.work_dir,
                         mesh=make_mesh(jax.devices()[:1]))
        loop.register_hook(Collect())
        loop.run()
        assert np.mean(losses[-3:]) < np.mean(losses[:3])


class TestRankStridedReorder:
    def test_inverts_sharded_sampler_layout(self):
        """ShardedSampler(no-shuffle) gives rank r indices [r, r+w, ...];
        gathering per-rank results and reordering must restore dataset
        order, including truncation of wrap-padding."""
        from mvfnet_tpu.data import ShardedSampler
        from mvfnet_tpu.engine.eval import reorder_rank_strided
        n, world, k = 10, 4, 3
        data = np.arange(n * k, dtype=np.float32).reshape(n, k)
        per_rank = []
        for r in range(world):
            idx = ShardedSampler(n, world, r, shuffle=False).local_indices()
            per_rank.append(data[idx])
        gathered = np.concatenate(per_rank)  # what process_allgather yields
        out = reorder_rank_strided(gathered, world, n)
        np.testing.assert_array_equal(out, data)
