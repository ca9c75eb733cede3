"""Device-side normalization: uint8 transfer path must produce identical
scores to host-side Normalize."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvfnet_tpu.data import Compose
from mvfnet_tpu.ops.normalize import device_normalize

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


class TestDeviceNormalize:
    def test_matches_host_normalize(self):
        rng = np.random.RandomState(0)
        frames = [rng.randint(0, 255, (16, 12, 3), np.uint8)
                  for _ in range(4)]
        host_pipe = Compose([
            dict(type='Normalize', mean=MEAN, std=STD, to_rgb=True),
            dict(type='FormatShape', input_format='NHWC'),
        ])
        dev_pipe = Compose([
            dict(type='Normalize', mean=MEAN, std=STD, to_rgb=True,
                 device=True),
            dict(type='FormatShape', input_format='NHWC'),
        ])
        base = dict(modality='RGB', num_clips=1, clip_len=4)
        host = host_pipe(dict(base, img_group=[f.copy() for f in frames]))
        dev = dev_pipe(dict(base, img_group=[f.copy() for f in frames]))
        assert dev['img_group'].dtype == np.uint8  # stays uint8 on host
        assert dev['img_norm_cfg']['device'] is True
        on_device = device_normalize(jnp.asarray(dev['img_group']),
                                     dev['img_norm_cfg'])
        np.testing.assert_allclose(np.asarray(on_device),
                                   host['img_group'], rtol=1e-6, atol=1e-5)

    def test_div255_and_no_rgb(self):
        x = np.full((2, 4, 4, 3), 255, np.uint8)
        out = device_normalize(jnp.asarray(x),
                               dict(mean=[0.5, 0.5, 0.5], std=[1, 1, 1],
                                    div_255=True, to_rgb=False))
        np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-6)

    def test_train_step_with_uint8_input(self):
        from mvfnet_tpu.engine.optim import build_optimizer
        from mvfnet_tpu.engine.train_step import (TrainState,
                                                  make_train_step)
        from mvfnet_tpu.models import build_recognizer
        model = build_recognizer(dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=512, init_std=0.01, num_classes=3)),
            test_cfg=dict(average_clips='prob'))
        imgs_f = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
        labels = jnp.zeros((1,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), imgs_f, labels,
                               return_loss=True, train=False)
        tx = build_optimizer(variables['params'],
                             dict(type='SGD', lr=0.01, momentum=0.9),
                             lambda s: 0.01, grad_clip=None)
        state = TrainState.create(variables, tx)
        step = make_train_step(
            model, tx, mesh=None, donate=False,
            norm_cfg=dict(mean=MEAN, std=STD, to_rgb=True, device=True))
        imgs_u8 = jnp.asarray(
            np.random.RandomState(1).randint(0, 255, (1, 2, 32, 32, 3),
                                             np.uint8))
        new_state, metrics = step(state, imgs_u8, labels,
                                  jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics['loss']))
