"""Capstone: the MVF module learns *temporal* structure.

Synthetic motion-direction task: every video shows the same white square on
black; class 0 moves right, class 1 moves left. Appearance statistics are
identical between classes, and TSN consensus averages over frames — so a
2-D model without a temporal module cannot separate them, while MVF's
temporal taps can. Training the MVF model to high accuracy on this task is
direct evidence the temporal pathway works end-to-end (model + pipeline +
optimizer)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.engine.optim import build_optimizer
from mvfnet_tpu.engine.train_step import TrainState, make_train_step

T, H, W = 4, 16, 16


def make_motion_batch(rng, n):
    """n videos: white 4x4 square sliding right (label 0) or left (1),
    random start row/col; per-frame appearance identical across classes."""
    imgs = np.zeros((n, T, H, W, 3), np.float32)
    labels = rng.randint(0, 2, size=n).astype(np.int32)
    for i in range(n):
        row = rng.randint(2, H - 6)
        col = rng.randint(4, W - 4 - T)
        d = 1 if labels[i] == 0 else -1
        start = col if d == 1 else col + T
        for t in range(T):
            c = start + d * t
            imgs[i, t, row:row + 4, c:c + 4, :] = 1.0
    return imgs, labels


def train_model(module_cfg, steps=90, seed=0):
    model = build_recognizer(dict(
        type='Recognizer2D',
        backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                      norm_eval=False,
                      norm_cfg=dict(type='BN', requires_grad=True)),
        cls_head=dict(type='TSNClsHead', spatial_size=-1,
                      spatial_type='avg', dropout_ratio=0.0,
                      in_channels=512, init_std=0.01, num_classes=2),
        module_cfg=module_cfg),
        test_cfg=dict(average_clips=None))
    rng = np.random.RandomState(seed)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, T, H, W, 3), jnp.float32),
                           jnp.zeros((1,), jnp.int32),
                           return_loss=True, train=False)
    tx = build_optimizer(variables['params'],
                         dict(type='SGD', lr=0.05, momentum=0.9,
                              weight_decay=1e-4, nesterov=True),
                         lambda s: 0.05,
                         grad_clip=dict(max_norm=40, norm_type=2))
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mesh=None, donate=False)
    key = jax.random.PRNGKey(1)
    for i in range(steps):
        imgs, labels = make_motion_batch(rng, 16)
        state, metrics = step(state, jnp.asarray(imgs),
                              jnp.asarray(labels), key)
    # eval accuracy on fresh data (train-mode off)
    eval_rng = np.random.RandomState(999)
    imgs, labels = make_motion_batch(eval_rng, 128)
    scores = model.apply({'params': jax.device_get(state.params),
                          'batch_stats': jax.device_get(state.batch_stats)},
                         jnp.asarray(imgs), None, return_loss=False)
    pred = np.argmax(np.asarray(scores), axis=1)
    return float((pred == labels).mean())


class TestTemporalLearning:
    def test_mvf_solves_motion_direction(self):
        acc = train_model(dict(type='MVF', n_segment=T, alpha=0.25,
                               mvf_freq=(1, 1, 1, 1), mode='THW'))
        # threshold leaves headroom for SGD trajectory noise (fp reduction
        # order changes across refactors); chance level is 0.5
        assert acc >= 0.85, f'MVF model only reached {acc:.2f}'

    def test_plain_tsn_cannot(self):
        """Without a temporal module the task is information-theoretically
        unsolvable (consensus averages per-frame logits of identical
        appearance) — accuracy stays near chance."""
        acc = train_model(None)
        assert acc <= 0.7, f'temporal-free model unexpectedly at {acc:.2f}'
