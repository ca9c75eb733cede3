"""Weight-import + full-network numerics parity vs the torch oracle.

This is the accuracy-critical test: a randomly-initialized torch MVFNet-R50
(reference checkpoint key vocabulary) is imported into the Flax model and
both are run in eval mode on the same input — logits must agree to fp32
tolerance. Validates: conv/BN weight layout conversion, stem/maxpool padding
semantics, bottleneck wiring, downsample, MVF taps + BN fold, head FC, and
segment consensus.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.utils.checkpoint import (import_torch_weights,
                                         load_checkpoint,
                                         save_checkpoint)

from torch_oracle import TorchMVFNetR50, export_reference_style_state_dict

NUM_CLASSES = 11
T = 4


def flax_cfg():
    return dict(
        type='Recognizer2D',
        backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                      norm_eval=False,
                      norm_cfg=dict(type='BN', requires_grad=True)),
        cls_head=dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                      dropout_ratio=0.5, in_channels=2048, init_std=0.01,
                      num_classes=NUM_CLASSES),
        module_cfg=dict(type='MVF', n_segment=T, alpha=0.125,
                        mvf_freq=(0, 0, 1, 1), mode='THW'),
        # dtype=None -> no f32 casts; computation follows input/param dtype
        # (float64 in this parity fixture)
        dtype=None,
    )


@pytest.fixture(scope='module')
def parity_setup():
    """float64 on both sides: any wiring/layout bug shows as a gross error,
    while fp32 conv-accumulation noise (oneDNN vs XLA ordering) is gone."""
    jax.config.update('jax_enable_x64', True)
    torch.manual_seed(0)
    oracle = TorchMVFNetR50(num_classes=NUM_CLASSES, n_segment=T)
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    oracle = oracle.double().eval()

    model = build_recognizer(flax_cfg(), test_cfg=dict(average_clips=None))
    imgs0 = jnp.zeros((1, T, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs0,
                           jnp.zeros((1,), jnp.int32), return_loss=True,
                           train=False)
    sd = {k: v.numpy() for k, v in
          export_reference_style_state_dict(oracle).items()}
    new_vars = import_torch_weights(sd, variables)
    new_vars = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float64), new_vars)
    yield oracle, model, new_vars
    jax.config.update('jax_enable_x64', False)


class TestImportParity:
    def test_all_params_imported(self, parity_setup):
        oracle, model, new_vars = parity_setup
        # stem conv actually changed from random init
        k = new_vars['params']['backbone_mod']['conv1']['kernel']
        ref = oracle.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
        np.testing.assert_allclose(k, ref)
        # MVF taps: (C,1,3,1,1) -> (3,C)
        taps = new_vars['params']['backbone_mod']['layer3_0']['MVF_0'][
            'shift_conv']
        ref_taps = oracle.layer3[0].conv1.shift_conv.weight.detach().numpy()
        np.testing.assert_allclose(taps, ref_taps.reshape(-1, 3).T)
        # head fc
        fc = new_vars['params']['head_mod']['fc']['kernel']
        np.testing.assert_allclose(fc, oracle.new_fc.weight.detach().numpy().T)

    def test_full_network_logits_match(self, parity_setup):
        oracle, model, new_vars = parity_setup
        rng = np.random.RandomState(3)
        x = rng.randn(2 * T, 64, 64, 3)

        with torch.no_grad():
            ref = oracle(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy()  # (2, K)

        imgs = jnp.asarray(x.reshape(2, T, 64, 64, 3))
        # impl='jnp' path on CPU automatically (no TPU backend in tests)
        ours = model.apply(new_vars, imgs, None, return_loss=False)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6,
                                   atol=1e-8)

    def test_backbone_features_match(self, parity_setup):
        oracle, model, new_vars = parity_setup
        rng = np.random.RandomState(4)
        x = rng.randn(T, 64, 64, 3)
        with torch.no_grad():
            ref = oracle.features(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy()  # (T, 2048, 2, 2)
        feat = model.apply(
            new_vars, jnp.asarray(x), False,
            method=lambda m, a, t: m.extract_feat(a, t))
        feat = np.asarray(feat).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(feat, ref, rtol=1e-6, atol=1e-8)


class TestNativeCheckpoint:
    def test_save_load_roundtrip(self, parity_setup, tmp_path):
        _, model, new_vars = parity_setup
        path = str(tmp_path / 'ckpt.msgpack')
        save_checkpoint(path, new_vars, opt_state=None,
                        meta={'epoch': 3, 'iter': 120})
        variables, opt_state, meta = load_checkpoint(path)
        assert meta == {'epoch': 3, 'iter': 120}
        got = variables['variables'] if 'variables' in variables else variables
        k1 = np.asarray(
            got['params']['backbone_mod']['conv1']['kernel'])
        k0 = np.asarray(new_vars['params']['backbone_mod']['conv1']['kernel'])
        np.testing.assert_allclose(k1, k0)
        assert opt_state is None


class TestOrbaxBackend:
    def test_orbax_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from mvfnet_tpu.utils.checkpoint import (load_checkpoint_orbax,
                                                 save_checkpoint_orbax)
        variables = {'params': {'w': np.arange(6, dtype=np.float32
                                               ).reshape(2, 3)},
                     'batch_stats': {'m': np.zeros(3, np.float32)}}
        save_checkpoint_orbax(str(tmp_path), variables, opt_state=None,
                              meta={'epoch': 2}, step=40)
        got_vars, got_opt, meta = load_checkpoint_orbax(str(tmp_path), 40)
        assert meta == {'epoch': 2}
        np.testing.assert_allclose(np.asarray(got_vars['params']['w']),
                                   variables['params']['w'])
        assert got_opt is None


class TestI3DInflation:
    def test_2d_checkpoint_inflates_into_i3d(self):
        """2D ResNet weights inflate into the I3D backbone:
        w3d[t] = w2d / kT, BN stats copied (resnet_i3d.py init_weights)."""
        model = build_recognizer(dict(
            type='Recognizer3D',
            backbone=dict(type='ResNet_I3D', depth=50, out_indices=(3,),
                          norm_eval=False, inflate_style='3x1x1',
                          norm_cfg=dict(type='BN3d')),
            cls_head=dict(type='I3DClsHead', spatial_size=-1,
                          temporal_size=-1, dropout_ratio=0.5,
                          in_channels=2048, num_classes=4)),
            test_cfg=dict(average_clips=None))
        imgs = jnp.zeros((1, 1, 4, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imgs,
                               jnp.zeros((1,), jnp.int32),
                               return_loss=True, train=False)
        rng = np.random.RandomState(0)
        stem_2d = rng.randn(64, 3, 7, 7).astype(np.float32)
        bn_gamma = rng.randn(64).astype(np.float32)
        sd = {'conv1.weight': stem_2d, 'bn1.weight': bn_gamma}
        new_vars = import_torch_weights(sd, variables)
        got = np.asarray(
            new_vars['params']['backbone_mod']['conv1']['kernel'])
        kt = got.shape[0]  # conv1_kernel default (5,7,7)
        assert got.shape == (5, 7, 7, 3, 64)
        expect = stem_2d.transpose(2, 3, 1, 0) / kt
        for t in range(kt):
            np.testing.assert_allclose(got[t], expect, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_vars['params']['backbone_mod']['bn1']['scale']),
            bn_gamma)


class TestBNInceptionImport:
    def test_caffe_vocabulary_maps(self):
        """BNInception torch keys (caffe conversion) import into our
        data-driven graph."""
        from mvfnet_tpu.models import build_backbone
        bb = build_backbone(dict(type='BNInception', bn_eval=False))
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x, train=False)
        # wrap like a recognizer tree (importer expects backbone_mod/...)
        tree = {'params': {'backbone_mod': variables['params']},
                'batch_stats': {'backbone_mod': variables['batch_stats']}}
        rng = np.random.RandomState(0)
        sd = {
            'conv1_7x7_s2.weight': rng.randn(64, 3, 7, 7).astype(np.float32),
            'conv1_7x7_s2.bias': rng.randn(64).astype(np.float32),
            'conv1_7x7_s2_bn.weight': rng.randn(64).astype(np.float32),
            'conv1_7x7_s2_bn.running_mean':
                rng.randn(64).astype(np.float32),
            'inception_3a_double_3x3_1.weight':
                rng.randn(96, 64, 3, 3).astype(np.float32),
            'inception_3a_double_3x3_1_bn.bias':
                rng.randn(96).astype(np.float32),
            'inception_5b_pool_proj.weight':
                rng.randn(128, 1024, 1, 1).astype(np.float32),
        }
        new = import_torch_weights(sd, tree)
        p = new['params']['backbone_mod']
        np.testing.assert_allclose(
            p['conv1_7x7_s2']['conv']['kernel'],
            sd['conv1_7x7_s2.weight'].transpose(2, 3, 1, 0))
        np.testing.assert_allclose(p['conv1_7x7_s2']['conv']['bias'],
                                   sd['conv1_7x7_s2.bias'])
        np.testing.assert_allclose(p['conv1_7x7_s2']['bn']['scale'],
                                   sd['conv1_7x7_s2_bn.weight'])
        np.testing.assert_allclose(
            new['batch_stats']['backbone_mod']['conv1_7x7_s2']['bn']['mean'],
            sd['conv1_7x7_s2_bn.running_mean'])
        np.testing.assert_allclose(
            p['inception_3a']['bd1']['conv']['kernel'],
            sd['inception_3a_double_3x3_1.weight'].transpose(2, 3, 1, 0))
        np.testing.assert_allclose(
            p['inception_3a']['bd1']['bn']['bias'],
            sd['inception_3a_double_3x3_1_bn.bias'])
        np.testing.assert_allclose(
            p['inception_5b']['bpool_proj']['conv']['kernel'],
            sd['inception_5b_pool_proj.weight'].transpose(2, 3, 1, 0))


class TestMoreImportVocabularies:
    def test_mobilenet_v2_dli14_keys(self):
        from mvfnet_tpu.models import build_backbone
        bb = build_backbone(dict(type='MobileNetV2', norm_eval=False))
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x, train=False)
        tree = {'params': {'backbone_mod': variables['params']},
                'batch_stats': {'backbone_mod': variables['batch_stats']}}
        rng = np.random.RandomState(0)
        sd = {
            'features.0.0.weight': rng.randn(32, 3, 3, 3).astype(np.float32),
            'features.0.1.weight': rng.randn(32).astype(np.float32),
            # block 0 (t=1): conv.0 is depthwise
            'features.1.conv.0.weight':
                rng.randn(32, 1, 3, 3).astype(np.float32),
            # block 1 (t=6): conv.0 is pointwise expand
            'features.2.conv.0.weight':
                rng.randn(96, 16, 1, 1).astype(np.float32),
            'conv.0.weight': rng.randn(1280, 320, 1, 1).astype(np.float32),
            'conv.1.running_var': np.abs(rng.randn(1280)).astype(np.float32),
        }
        new = import_torch_weights(sd, tree)
        p = new['params']['backbone_mod']
        np.testing.assert_allclose(
            p['stem_conv']['kernel'],
            sd['features.0.0.weight'].transpose(2, 3, 1, 0))
        np.testing.assert_allclose(p['stem_bn']['scale'],
                                   sd['features.0.1.weight'])
        np.testing.assert_allclose(
            p['block0']['dw_conv']['kernel'],
            sd['features.1.conv.0.weight'].transpose(2, 3, 1, 0))
        np.testing.assert_allclose(
            p['block1']['pw_conv']['kernel'],
            sd['features.2.conv.0.weight'].transpose(2, 3, 1, 0))
        np.testing.assert_allclose(
            p['head_conv']['kernel'],
            sd['conv.0.weight'].transpose(2, 3, 1, 0))
        np.testing.assert_allclose(
            new['batch_stats']['backbone_mod']['head_bn']['var'],
            sd['conv.1.running_var'])

    def test_inception_i3d_keys(self):
        from mvfnet_tpu.models import build_backbone
        bb = build_backbone(dict(type='InceptionV1_I3D', bn_eval=False))
        x = jnp.zeros((1, 8, 64, 64, 3), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x, train=False)
        tree = {'params': {'backbone_mod': variables['params']},
                'batch_stats': {'backbone_mod': variables['batch_stats']}}
        rng = np.random.RandomState(1)
        sd = {
            'conv1_7x7_s2.weight':
                rng.randn(64, 3, 7, 7, 7).astype(np.float32),
            'conv1_7x7_s2_bn.weight': rng.randn(64).astype(np.float32),
            'inception_3a_branch1_3x3.weight':
                rng.randn(128, 96, 3, 3, 3).astype(np.float32),
            'inception_3a_pool_proj.weight':
                rng.randn(32, 192, 1, 1, 1).astype(np.float32),
        }
        new = import_torch_weights(sd, tree)
        p = new['params']['backbone_mod']
        np.testing.assert_allclose(
            p['conv1_7x7_s2']['kernel'],
            sd['conv1_7x7_s2.weight'].transpose(2, 3, 4, 1, 0))
        np.testing.assert_allclose(p['conv1_bn']['scale'],
                                   sd['conv1_7x7_s2_bn.weight'])
        np.testing.assert_allclose(
            p['inception_3a']['b1_3x3']['conv']['kernel'],
            sd['inception_3a_branch1_3x3.weight'].transpose(2, 3, 4, 1, 0))
        np.testing.assert_allclose(
            p['inception_3a']['pool_proj']['conv']['kernel'],
            sd['inception_3a_pool_proj.weight'].transpose(2, 3, 4, 1, 0))
