"""Eval-only int8 conv path for the 3-D backbones (VERDICT r2 item 4).

Contract (mirrors tests/test_quant_int8.py for the 2-D backbone):
- same parameter tree as the exact model (checkpoints load unchanged),
- per-layer-TYPE masking: only conv types named in ``quant_ops``
  quantize (I3D default 'spatial' — the conv3d microbench showed
  spatial 1x3x3 +41% int8 / temporal 3x1x1 loses; X3D default
  'pointwise' — mobile blocks have no spatial-type convs),
- per-stage masking via ``quant_stages`` (0 mask == exact equality),
- bounded logit drift vs the exact path,
- train mode rejected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvfnet_tpu.models import build_backbone, build_recognizer
from mvfnet_tpu.models.common import quant_conv3d_type


def _i3d_bb(quant=None, **kw):
    return build_backbone(dict(
        type='ResNet_I3D', depth=50, out_indices=(3,),
        inflate_freq=(1, 1, 1, 1), inflate_style='3x1x1',
        conv1_kernel=(5, 7, 7), conv1_stride_t=2, pool1_stride_t=2,
        norm_eval=False, norm_cfg=dict(type='BN3d', requires_grad=True),
        quant=quant, **kw))


def _x3d_bb(quant=None, **kw):
    return build_backbone(dict(
        type='ResNet_X3D', depth=50, ratio_width=1, ratio_bottleneck=2.25,
        inflate_style='mobile', norm_eval=False,
        norm_cfg=dict(type='BN3d', requires_grad=True), quant=quant, **kw))


def test_quant_conv3d_type():
    assert quant_conv3d_type((3, 1, 1)) == 'temporal'
    assert quant_conv3d_type((3, 3, 3)) == 'temporal'
    assert quant_conv3d_type((1, 3, 3)) == 'spatial'
    assert quant_conv3d_type((1, 1, 1)) == 'pointwise'


class TestI3DQuant:

    def test_same_tree_bounded_drift_and_type_gating(self):
        m0, m8 = _i3d_bb(None), _i3d_bb('int8')
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32, 32, 3)) * 2.
        v = m0.init(jax.random.PRNGKey(0), x, train=False)
        v8 = m8.init(jax.random.PRNGKey(0), x, train=False)
        assert (jax.tree_util.tree_structure(v['params'])
                == jax.tree_util.tree_structure(v8['params']))
        # spatial-only gating: every quantized conv is a conv2 of a
        # 3x1x1-inflated bottleneck (the only spatial-type conv in I3D)
        flat = jax.tree_util.tree_flatten_with_path(v8['quant_stats'])[0]
        paths = {'/'.join(str(k.key) for k in p) for p, _ in flat}
        conv_paths = {p.rsplit('/', 1)[0] for p in paths}
        assert conv_paths and all(p.endswith('conv2') for p in conv_paths), \
            conv_paths
        s0 = np.asarray(m0.apply(v, x, train=False))
        s8 = np.asarray(m8.apply({'params': v['params'],
                                  'batch_stats': v['batch_stats']},
                                 x, train=False))
        rms = np.sqrt(((s0 - s8) ** 2).mean())
        assert 0 < rms < 0.05 * np.sqrt((s0 ** 2).mean()), rms

    def test_stage_mask_off_is_exact(self):
        m0 = _i3d_bb(None)
        m_off = _i3d_bb('int8', quant_stages=(0, 0, 0, 0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32, 32, 3))
        v = m0.init(jax.random.PRNGKey(0), x, train=False)
        s0 = np.asarray(m0.apply(v, x, train=False))
        s_off = np.asarray(m_off.apply(v, x, train=False))
        np.testing.assert_array_equal(s_off, s0)

    def test_train_mode_rejected_and_stage_len_validated(self):
        x = jnp.zeros((1, 8, 32, 32, 3))
        with pytest.raises(ValueError, match='eval-only'):
            _i3d_bb('int8').init(jax.random.PRNGKey(0), x, train=True)
        with pytest.raises(ValueError, match='quant_stages'):
            _i3d_bb('int8', quant_stages=(1,)).init(
                jax.random.PRNGKey(0), x, train=False)

    def test_recognizer3d_end_to_end(self):
        """Full Recognizer3D scores with int8 backbone stay close to
        exact and sum to one under average_clips='prob'."""
        def rec(quant):
            return build_recognizer(
                dict(type='Recognizer3D',
                     backbone=dict(type='ResNet_I3D', depth=50,
                                   out_indices=(3,), norm_eval=False,
                                   quant=quant,
                                   norm_cfg=dict(type='BN3d')),
                     cls_head=dict(type='I3DClsHead', spatial_size=-1,
                                   temporal_size=-1, dropout_ratio=0.5,
                                   in_channels=2048, num_classes=13)),
                test_cfg=dict(average_clips='prob'))
        m0, m8 = rec(None), rec('int8')
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 8, 32, 32, 3))
        v = m0.init(jax.random.PRNGKey(0), x[:1], None,
                    return_loss=False, train=False)
        s0 = np.asarray(m0.apply(v, x, None, return_loss=False))
        s8 = np.asarray(m8.apply(v, x, None, return_loss=False))
        np.testing.assert_allclose(s8.sum(-1), 1.0, rtol=1e-3)
        assert (s0.argmax(-1) == s8.argmax(-1)).all()


class TestX3DQuant:

    def test_pointwise_gating_and_bounded_drift(self):
        m0, m8 = _x3d_bb(None), _x3d_bb('int8')
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32, 32, 3)) * 2.
        v = m0.init(jax.random.PRNGKey(0), x, train=False)
        v8 = m8.init(jax.random.PRNGKey(0), x, train=False)
        assert (jax.tree_util.tree_structure(v['params'])
                == jax.tree_util.tree_structure(v8['params']))
        flat = jax.tree_util.tree_flatten_with_path(v8['quant_stats'])[0]
        conv_paths = {'/'.join(str(k.key) for k in p).rsplit('/', 1)[0]
                      for p, _ in flat}
        # pointwise-only: conv1/conv3/downsample_conv, never the
        # depthwise conv2 (temporal type, and not MXU work anyway)
        assert conv_paths
        assert all(p.endswith(('conv1', 'conv3', 'downsample_conv'))
                   for p in conv_paths), conv_paths
        s0 = np.asarray(m0.apply(v, x, train=False))
        s8 = np.asarray(m8.apply({'params': v['params'],
                                  'batch_stats': v['batch_stats']},
                                 x, train=False))
        rms = np.sqrt(((s0 - s8) ** 2).mean())
        assert 0 < rms < 0.05 * np.sqrt((s0 ** 2).mean()), rms

    def test_static_calibration_flow(self):
        m0 = _x3d_bb(None)
        ms = _x3d_bb('int8_static')
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32, 32, 3))
        v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
        vs = ms.init(jax.random.PRNGKey(0), x, train=False)
        mixed = {'params': v0['params'], 'batch_stats': v0['batch_stats'],
                 'quant_stats': vs['quant_stats']}
        _, mut = ms.apply(mixed, x, train=False, mutable=['quant_stats'])
        mixed['quant_stats'] = mut['quant_stats']
        ss = np.asarray(ms.apply(mixed, x, train=False))
        s0 = np.asarray(m0.apply(v0, x, train=False))
        rms = np.sqrt(((s0 - ss) ** 2).mean())
        assert rms < 0.05 * np.sqrt((s0 ** 2).mean()), rms

    def test_s2d_stage_excludes_quant(self):
        """A stage running s2d keeps its exact path (quant is per-stage
        mutually exclusive with s2d; s2d wins)."""
        m = _x3d_bb('int8', s2d_stages=(0, 1, 2, 3))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        assert 'quant_stats' not in v
