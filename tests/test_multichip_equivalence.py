"""Multi-chip equivalence invariants (VERDICT round-1, item 6).

The round-1 suite proved the DP primitives compile and run; these tests
assert the *semantics* the reference's NCCL machinery guarantees
(``/root/reference/codes/core/dist_utils.py:15-49``, ``test.py:147-185``):

1. N-device data parallelism is an execution detail: the same global batch
   through the same init must produce the same loss trajectory and the
   same parameters on an 8-device mesh as on a 1-device mesh.
2. The sharded-eval collection math (ShardedSampler pad+stride ->
   process_allgather order -> reorder_rank_strided) reconstructs exactly
   the single-process score order for any dataset/world combination.

Runs on the conftest-provided 8 virtual CPU devices.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvfnet_tpu.data.sampler import ShardedSampler
from mvfnet_tpu.engine.eval import reorder_rank_strided
from mvfnet_tpu.engine.optim import build_lr_schedule, build_optimizer
from mvfnet_tpu.engine.train_step import TrainState, make_train_step
from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def _tiny_model(norm_eval: bool):
    return build_recognizer(
        dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=norm_eval,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.0,
                          in_channels=512, init_std=0.01, num_classes=4),
            module_cfg=dict(type='MVF', n_segment=2, alpha=0.125,
                            mvf_freq=(0, 0, 1, 1), mode='THW'),
        ),
        test_cfg=dict(average_clips='prob'))


def _run_steps(n_devices: int, n_steps: int = 3, norm_eval: bool = True):
    model = _tiny_model(norm_eval)
    b, clip_len = 8, 2
    rng = np.random.RandomState(0)
    imgs = rng.randn(n_steps, b, clip_len, 16, 16, 3).astype(np.float32)
    labels = (np.arange(b, dtype=np.int32) % 4)[None].repeat(n_steps, 0)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs[0, :1]),
                           jnp.asarray(labels[0, :1]), return_loss=True,
                           train=False)
    lr = build_lr_schedule(dict(policy='step', step=[100]), 0.05,
                           iters_per_epoch=10, total_epochs=20)
    tx = build_optimizer(variables['params'],
                         dict(type='SGD', lr=0.05, momentum=0.9,
                              weight_decay=1e-4, nesterov=True), lr,
                         grad_clip=dict(max_norm=40, norm_type=2))
    mesh = make_mesh(jax.devices('cpu')[:n_devices])
    state = replicate(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(n_steps):
        batch = shard_batch({'img_group': imgs[i], 'label': labels[i]},
                            mesh)
        state, metrics = step(state, batch['img_group'], batch['label'],
                              key)
        losses.append(float(np.asarray(metrics['loss'])))
    params = jax.tree_util.tree_map(np.asarray, state.params)
    stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    return losses, params, stats


def test_8dev_matches_1dev_training():
    """With BN frozen the only cross-device math is the gradient
    all-reduce: 8-device DP must reproduce 1-device training to float
    reassociation noise (the reference's allreduce_grads contract,
    dist_utils.py:15-49)."""
    assert len(jax.devices('cpu')) >= 8, 'conftest must provide 8 devices'
    losses1, params1, _ = _run_steps(1)
    losses8, params8, _ = _run_steps(8)
    np.testing.assert_allclose(losses8, losses1, rtol=2e-5, atol=2e-6)
    flat1 = jax.tree_util.tree_leaves(params1)
    flat8 = jax.tree_util.tree_leaves(params8)
    assert len(flat1) == len(flat8)
    # atol covers near-zero params (BN biases ~1e-4 after 3 steps) whose
    # per-step updates are lr*grad with reassociated-gradient noise;
    # larger weights are held to the relative bound. (Round 4: this test
    # briefly failed because MVF's inline BN ignored norm_eval and
    # computed batch stats over the sharded batch — a real reference-
    # semantics gap, fixed in modules/mvf.py; with every BN actually
    # frozen the 1-vs-8 divergence is back under this bound.)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=2e-4)


def test_8dev_syncbn_stats_match_1dev():
    """Train-mode BN: batch statistics are computed over the *global*
    batch (SyncBN semantics — DESIGN.md deviation note), so the updated
    running stats must match the 1-device run. Tolerance is looser: the
    E[x^2]-E[x]^2 variance form amplifies reassociation differences, and
    one optimizer step compounds them into the step-2 loss."""
    losses1, _, stats1 = _run_steps(1, n_steps=2, norm_eval=False)
    losses8, _, stats8 = _run_steps(8, n_steps=2, norm_eval=False)
    np.testing.assert_allclose(losses8[0], losses1[0], rtol=1e-6)
    np.testing.assert_allclose(losses8[1], losses1[1], rtol=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(stats1),
                    jax.tree_util.tree_leaves(stats8)):
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-5)


@pytest.mark.parametrize('n,world', [(7, 2), (8, 3), (16, 8), (3, 8),
                                     (1, 2)])
def test_sharded_eval_collection_reconstructs_order(n, world):
    """shard -> per-rank eval -> gather-concat -> reorder == direct order,
    for uneven shards, world > n, and exact divisions alike."""
    k = 5
    direct = np.arange(n * k, dtype=np.float64).reshape(n, k)

    per_rank = []
    for rank in range(world):
        sampler = ShardedSampler(n, world, rank, shuffle=False, pad=True)
        idx = list(iter(sampler))
        assert len(idx) == len(sampler)
        per_rank.append(direct[np.asarray(idx)])
    shard_len = {len(s) for s in per_rank}
    assert len(shard_len) == 1, 'pad=True must equalize shards'
    gathered = np.concatenate(per_rank, axis=0)
    out = reorder_rank_strided(gathered, world, n)
    np.testing.assert_array_equal(out, direct)


def test_rank_strided_assignment():
    """Global index i must be evaluated by rank i % world at slot
    i // world (the layout reorder_rank_strided inverts)."""
    n, world = 10, 3
    for rank in range(world):
        idx = list(iter(ShardedSampler(n, world, rank, shuffle=False,
                                       pad=True)))
        expect = [i for i in range(n) if i % world == rank]
        assert idx[:len(expect)] == expect
