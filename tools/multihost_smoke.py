#!/usr/bin/env python3
"""Two-process multi-host smoke test (CPU backend).

Run (each in its own process):
    PROCESS_ID=0 python tools/multihost_smoke.py
    PROCESS_ID=1 python tools/multihost_smoke.py

Validates the real multi-host path end-to-end without TPU pods:
jax.distributed bootstrap, global-mesh construction across processes,
per-host input shards assembled with make_array_from_process_local_data,
the compiled data-parallel train step, and process_allgather result
collection with rank-strided reordering.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

os.environ.setdefault('XLA_FLAGS',
                      '--xla_force_host_platform_device_count=2')

import jax

jax.config.update('jax_platforms', 'cpu')


def main():
    pid = int(os.environ.get('PROCESS_ID', '0'))
    nproc = int(os.environ.get('NUM_PROCESSES', '2'))
    coord = os.environ.get('COORDINATOR_ADDRESS', 'localhost:23456')

    from mvfnet_tpu.parallel import init_distributed, get_dist_info
    os.environ['COORDINATOR_ADDRESS'] = coord
    os.environ['NUM_PROCESSES'] = str(nproc)
    os.environ['PROCESS_ID'] = str(pid)
    init_distributed('env')
    info = get_dist_info()
    assert info['world_size'] == nproc, info
    print(f'[p{pid}] dist info: {info}', flush=True)

    import numpy as np
    import jax.numpy as jnp
    from mvfnet_tpu.engine.optim import build_lr_schedule, build_optimizer
    from mvfnet_tpu.engine.train_step import TrainState, make_train_step
    from mvfnet_tpu.models import build_recognizer
    from mvfnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    mesh = make_mesh()
    n_devices = int(np.prod(mesh.devices.shape))
    local = n_devices // nproc
    print(f'[p{pid}] mesh over {n_devices} devices, {local} local',
          flush=True)

    model = build_recognizer(dict(
        type='Recognizer2D',
        backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                      norm_eval=False,
                      norm_cfg=dict(type='BN', requires_grad=True)),
        cls_head=dict(type='TSNClsHead', spatial_size=-1,
                      spatial_type='avg', dropout_ratio=0.5,
                      in_channels=512, init_std=0.01, num_classes=3),
        module_cfg=dict(type='MVF', n_segment=2, alpha=0.25,
                        mvf_freq=(0, 0, 1, 1), mode='THW')),
        test_cfg=dict(average_clips='prob'))
    rng = np.random.RandomState(0)  # same init data on every process
    imgs_local = rng.randn(2 * local, 2, 32, 32, 3).astype(np.float32)
    labels_local = (np.arange(2 * local, dtype=np.int32) + pid) % 3

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
                           jnp.zeros((1,), jnp.int32), return_loss=True,
                           train=False)
    sched = build_lr_schedule(dict(policy='step', step=[10]), 0.01, 10, 2)
    tx = build_optimizer(variables['params'],
                         dict(type='SGD', lr=0.01, momentum=0.9), sched,
                         grad_clip=dict(max_norm=40, norm_type=2))
    state = replicate(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh=mesh)
    batch = shard_batch({'img_group': imgs_local, 'label': labels_local},
                        mesh)
    for i in range(2):
        state, metrics = step(state, batch['img_group'], batch['label'],
                              jax.random.PRNGKey(1))
    loss = float(np.asarray(
        jax.device_get(metrics['loss'])))
    print(f'[p{pid}] 2 steps done, loss={loss:.4f}', flush=True)

    # multihost gather path (evaluate-style)
    from jax.experimental import multihost_utils
    from mvfnet_tpu.engine.eval import reorder_rank_strided
    local_scores = np.full((3, 4), pid, np.float32)
    gathered = multihost_utils.process_allgather(local_scores)
    ordered = reorder_rank_strided(
        np.asarray(gathered).reshape(-1, 4), nproc, 6)
    expect_ranks = [i % nproc for i in range(6)]
    assert [int(r[0]) for r in ordered] == expect_ranks, ordered[:, 0]
    print(f'[p{pid}] allgather + reorder OK', flush=True)

    # full cross-process train -> checkpoint -> restore -> eval cycle
    # (reference parity: core/test.py dist eval after a resumed run).
    ckpt_dir = os.environ.get('MULTIHOST_CKPT_DIR')
    if ckpt_dir:
        from flax import serialization
        from mvfnet_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
        path = os.path.join(ckpt_dir, 'smoke.msgpack')
        # rank 0 writes (save_checkpoint no-ops elsewhere); barrier so
        # other processes don't read a half-written file
        save_checkpoint(path, state.variables(), opt_state=state.opt_state,
                        meta={'epoch': 1, 'iter': int(state.step)})
        multihost_utils.sync_global_devices('ckpt_saved')

        # eval scores from the live state (deterministic input, same
        # everywhere) — the restored model must reproduce them bit-exactly
        eval_x = jnp.asarray(
            np.random.RandomState(7).randn(2, 2, 32, 32, 3), jnp.float32)
        ref_scores = np.asarray(model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            eval_x, None, return_loss=False))

        variables_sd, opt_sd, meta = load_checkpoint(path)
        restored = TrainState(
            params=serialization.from_state_dict(
                jax.device_get(state.params), variables_sd['params']),
            batch_stats=serialization.from_state_dict(
                jax.device_get(state.batch_stats),
                variables_sd['batch_stats']),
            opt_state=serialization.from_state_dict(
                jax.device_get(state.opt_state), opt_sd),
            step=jnp.asarray(meta['iter'], jnp.int32))
        restored = replicate(restored, mesh)
        got_scores = np.asarray(model.apply(
            {'params': restored.params,
             'batch_stats': restored.batch_stats},
            eval_x, None, return_loss=False))
        assert np.array_equal(ref_scores, got_scores), \
            np.abs(ref_scores - got_scores).max()
        # the restored state must train on, synchronized, from where the
        # original left off (optimizer momentum restored too)
        restored, rmetrics = step(restored, batch['img_group'],
                                  batch['label'], jax.random.PRNGKey(2))
        state, cmetrics = step(state, batch['img_group'], batch['label'],
                               jax.random.PRNGKey(2))
        rloss = float(np.asarray(rmetrics['loss']))
        closs = float(np.asarray(cmetrics['loss']))
        assert abs(rloss - closs) < 1e-6, (rloss, closs)
        assert int(restored.step) == int(state.step), \
            (int(restored.step), int(state.step))
        print(f'[p{pid}] ckpt cycle OK, post-restore loss={rloss:.4f}',
              flush=True)

    print(f'[p{pid}] MULTIHOST_SMOKE_PASS', flush=True)


if __name__ == '__main__':
    main()
