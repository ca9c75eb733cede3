"""Multi-chip equivalence for the round-3 SlowFast train graph.

The tuned SlowFast training path differs structurally from every other
family: the fast pathway runs in T->C packed form (``fast_pack``,
``packed3d.py``) and both pathway stems run in space-to-depth form only
inside the train program (``stem_s2d='train'``). Those graph transforms
interact with the sharded batch axis (pjit partitions N; the pack/fold
reshapes touch T/H/W/C only), so this pins the same invariant
``test_multichip_equivalence.py`` pins for the flagship: N-device data
parallelism must be an execution detail.

Reference contract being preserved:
``/root/reference/codes/core/dist_utils.py:15-49`` (allreduce_grads) over
``/root/reference/codes/models/backbones/resnet_i3d_slowfast.py``.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mvfnet_tpu.engine.optim import build_lr_schedule, build_optimizer
from mvfnet_tpu.engine.train_step import TrainState, make_train_step
from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def _sf_model():
    return build_recognizer(
        dict(
            type='Recognizer3D',
            backbone=dict(type='ResNet_I3D_SlowFast', depth=50, tau=4,
                          alpha=4, beta_inv=8, out_indices=(3,),
                          norm_eval=True,
                          fast_pack=2, stem_s2d='train',
                          norm_cfg=dict(type='BN3d', requires_grad=True)),
            cls_head=dict(type='I3DSlowFastClsHead', in_channels=2304,
                          dropout_ratio=0.0, num_classes=4),
        ),
        test_cfg=dict(average_clips='prob'))


def _run_steps(n_devices: int, n_steps: int = 2):
    model = _sf_model()
    b, t = 8, 8
    rng = np.random.RandomState(0)
    imgs = rng.randn(n_steps, b, 1, t, 16, 16, 3).astype(np.float32)
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
    return losses, params


def test_slowfast_packed_s2d_4dev_matches_1dev():
    assert len(jax.devices('cpu')) >= 4, 'conftest must provide devices'
    losses1, params1 = _run_steps(1)
    losses4, params4 = _run_steps(4)
    np.testing.assert_allclose(losses4, losses1, rtol=2e-5, atol=2e-6)
    flat1 = jax.tree_util.tree_leaves(params1)
    flat4 = jax.tree_util.tree_leaves(params4)
    assert len(flat1) == len(flat4)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=2e-4)
