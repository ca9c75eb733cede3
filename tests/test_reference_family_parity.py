"""Family-zoo parity against the ACTUAL reference model code.

Completes the round-5 authentic-oracle program across the model zoo: for
every backbone family the reference implements
(``/root/reference/codes/models/backbones/``), build the reference's own
recognizer (its bytes, loaded via tests/reference_loader.py), transfer its
randomly-initialized ``state_dict()`` into our Flax model through the
production importer (``utils/checkpoint.py::import_torch_weights``), and
pin eval scores + train-mode loss in float64.

This catches two failure classes at once: importer vocabulary gaps (a key
that doesn't map fails the all-imported precondition) and architectural
misreadings (a structural divergence shows up as a score mismatch even
when every weight mapped). The R50+MVF 2-D family and I3D are pinned in
tests/test_reference_oracle_parity.py; here:

- ResNet_I3D_SlowFast (``resnet_i3d_slowfast.py:210-530``) + lateral conv
  + I3DSlowFastClsHead concat
- ResNet_X3D (``resnet_x3d.py:382-660``) at the reference's own depth
  factor 2.2 (stage blocks (3,5,11,7))
- ResNet_R3D / R(2+1)D (``resnet_r3d.py:237-420``, block_type='2.5d')
- MobileNetV2 2-D (``mobilenet_v2.py:89-180``)
- BNInception 2-D (``bninception.py``, the caffe-converted TSN backbone)
- InceptionV1_I3D (``inception_v1_i3d.py``)
- SimpleCoST module inside ResNet (``modules/CoST.py:59-120``)

All random inits are seeded torch; BN buffers are perturbed from their
(0,1) defaults so running-stat wiring is actually exercised.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mvfnet_tpu.engine.optim import build_optimizer, make_step_lr_schedule
from mvfnet_tpu.engine.train_step import TrainState, make_train_step
from mvfnet_tpu.models import build_recognizer
from mvfnet_tpu.utils.checkpoint import import_torch_weights

from reference_loader import load_reference
from test_train_trajectory_parity import mmcv_lr_factor

NUM_CLASSES = 8
HW = 64
B = 2


@pytest.fixture(scope='module')
def f64():
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', False)


@pytest.fixture(scope='module')
def ref():
    return load_reference()


def perturb_bn(model, seed=2):
    torch.manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d,
                              torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)


def to_jax_f64(model, flax_cfg, init_shape, recognizer3d=False):
    """Init our model, cast f64, and import the reference state_dict."""
    m = build_recognizer(flax_cfg, test_cfg=dict(average_clips=None))
    variables = m.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        jnp.zeros(init_shape, jnp.float32),
        jnp.zeros((1,), jnp.int32), return_loss=True, train=True)
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64), variables)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return m, import_torch_weights(sd, variables)


def compare_eval_and_train(ref, ref_model, model, variables, imgs, labels,
                           rtol=1e-9, loss_rtol=1e-10):
    """imgs: ours-layout numpy f64. Reference layout is derived from it."""
    if imgs.ndim == 6:          # (B, clips, T, H, W, C) -> [B,clips,C,T,H,W]
        ref_in = torch.from_numpy(imgs.transpose(0, 1, 5, 2, 3, 4))
    else:                       # (B, S, H, W, C) -> [B, S, C, H, W]
        ref_in = torch.from_numpy(imgs.transpose(0, 1, 4, 2, 3))
    y = torch.from_numpy(labels)

    ref_model.eval()
    with torch.no_grad():
        ref_scores = ref_model(img_group=ref_in, label=None,
                               return_loss=False, return_numpy=True)
    ours = model.apply(variables, jnp.asarray(imgs), None, return_loss=False)
    np.testing.assert_allclose(np.asarray(ours), ref_scores,
                               rtol=rtol, atol=1e-12)

    ref_model.train()
    with torch.no_grad():
        losses = ref_model(img_group=ref_in, label=y, return_loss=True)
    our_losses, _ = model.apply(
        variables, jnp.asarray(imgs), jnp.asarray(labels),
        return_loss=True, train=True,
        rngs={'dropout': jax.random.PRNGKey(0)}, mutable=['batch_stats'])
    np.testing.assert_allclose(float(our_losses['loss_cls']),
                               losses['loss_cls'].item(), rtol=loss_rtol)


# ---------------------------------------------------------------------------
# SlowFast
# ---------------------------------------------------------------------------

class TestSlowFastVsReferenceCode:
    T, TAU, ALPHA = 8, 4, 4

    def test_jax_matches_reference(self, f64, ref):
        torch.manual_seed(10)
        ref_model = ref.build_recognizer(
            dict(type='Recognizer3D',
                 backbone=dict(type='ResNet_I3D_SlowFast', depth=50,
                               tau=self.TAU, alpha=self.ALPHA, beta_inv=8,
                               out_indices=(3,),
                               slow_inflate_freq=(0, 0, 1, 1),
                               fast_inflate_freq=(1, 1, 1, 1),
                               bn_eval=False),
                 cls_head=dict(type='I3DSlowFastClsHead', spatial_size=-1,
                               temporal_size=-1, dropout_ratio=0.0,
                               in_channels=2048 + 256,
                               num_classes=NUM_CLASSES)),
            train_cfg=None, test_cfg=dict(average_clips=None))
        perturb_bn(ref_model)
        ref_model = ref_model.double()

        flax_cfg = dict(
            type='Recognizer3D',
            backbone=dict(type='ResNet_I3D_SlowFast', depth=50,
                          tau=self.TAU, alpha=self.ALPHA, beta_inv=8,
                          fast_pack=0, out_indices=(3,),
                          slow_inflate_freq=(0, 0, 1, 1),
                          fast_inflate_freq=(1, 1, 1, 1), norm_eval=False,
                          norm_cfg=dict(type='BN3d', requires_grad=True)),
            cls_head=dict(type='I3DSlowFastClsHead', spatial_size=-1,
                          temporal_size=-1, dropout_ratio=0.0,
                          in_channels=2048 + 256, num_classes=NUM_CLASSES),
            dtype=None)
        model, variables = to_jax_f64(
            ref_model, flax_cfg, (1, 1, self.T, HW, HW, 3))

        rng = np.random.RandomState(20)
        imgs = rng.randn(B, 1, self.T, HW, HW, 3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES, size=(B,)).astype(np.int64)
        compare_eval_and_train(ref, ref_model, model, variables, imgs,
                               labels)


class TestSlowFastTrajectoryVsReferenceOptimizer:
    """Composed f64 train steps of the 3-D family against the reference's
    own ``build_optimizer`` + ``batch_processor`` — extends the 2-D
    trajectory oracle (test_reference_oracle_parity.py) to the SlowFast
    recognizer: dual-path backbone, lateral convs, concat head."""

    T, TAU, ALPHA = 8, 4, 4
    STEPS, MILESTONE, WARMUP = 3, 2, 1
    LR, CLIP = 0.02, 2.0

    def test_three_steps_match(self, f64, ref):
        torch.manual_seed(30)
        ref_model = ref.build_recognizer(
            dict(type='Recognizer3D',
                 backbone=dict(type='ResNet_I3D_SlowFast', depth=50,
                               tau=self.TAU, alpha=self.ALPHA, beta_inv=8,
                               out_indices=(3,),
                               slow_inflate_freq=(0, 0, 1, 1),
                               fast_inflate_freq=(1, 1, 1, 1),
                               bn_eval=False),
                 cls_head=dict(type='I3DSlowFastClsHead', spatial_size=-1,
                               temporal_size=-1, dropout_ratio=0.0,
                               in_channels=2048 + 256,
                               num_classes=NUM_CLASSES)),
            train_cfg=None, test_cfg=dict(average_clips=None))
        perturb_bn(ref_model, seed=31)
        ref_model = ref_model.double()

        flax_cfg = dict(
            type='Recognizer3D',
            backbone=dict(type='ResNet_I3D_SlowFast', depth=50,
                          tau=self.TAU, alpha=self.ALPHA, beta_inv=8,
                          fast_pack=0, out_indices=(3,),
                          slow_inflate_freq=(0, 0, 1, 1),
                          fast_inflate_freq=(1, 1, 1, 1), norm_eval=False,
                          norm_cfg=dict(type='BN3d', requires_grad=True)),
            cls_head=dict(type='I3DSlowFastClsHead', spatial_size=-1,
                          temporal_size=-1, dropout_ratio=0.0,
                          in_channels=2048 + 256, num_classes=NUM_CLASSES),
            dtype=None)
        model, variables = to_jax_f64(
            ref_model, flax_cfg, (1, 1, self.T, HW, HW, 3))

        rng = np.random.RandomState(32)
        imgs = rng.randn(self.STEPS, B, 1, self.T, HW, HW, 3) * 0.5
        labels = rng.randint(0, NUM_CLASSES,
                             size=(self.STEPS, B)).astype(np.int64)

        # --- reference loop: its own build_optimizer (obj_from_dict
        #     path), batch_processor, clip_grad_norm_, per-iter mmcv LR
        opt = ref.build_optimizer(
            ref_model, dict(type='SGD', lr=self.LR, momentum=0.9,
                            weight_decay=1e-4, nesterov=True))
        base_lrs = [g['lr'] for g in opt.param_groups]
        ref_model.train()
        ref_losses = []
        for t in range(self.STEPS):
            f = mmcv_lr_factor(t, [self.MILESTONE], self.WARMUP)
            for g, lr0 in zip(opt.param_groups, base_lrs):
                g['lr'] = lr0 * f
            x = torch.from_numpy(imgs[t].transpose(0, 1, 5, 2, 3, 4))
            y = torch.from_numpy(labels[t])
            opt.zero_grad()
            outputs = ref.batch_processor(
                ref_model, dict(img_group=x, label=y), train_mode=True)
            outputs['loss'].backward()
            torch.nn.utils.clip_grad_norm_(ref_model.parameters(),
                                           self.CLIP)
            opt.step()
            ref_losses.append(outputs['log_vars']['loss'])

        # --- ours
        sched = make_step_lr_schedule(
            self.LR, [self.MILESTONE], iters_per_epoch=1, warmup='linear',
            warmup_iters=self.WARMUP, warmup_ratio=0.1)
        tx = build_optimizer(variables['params'],
                             dict(type='SGD', lr=self.LR, momentum=0.9,
                                  weight_decay=1e-4, nesterov=True),
                             sched,
                             grad_clip=dict(max_norm=self.CLIP,
                                            norm_type=2))
        step_fn = make_train_step(model, tx, mesh=None, donate=False)
        state = TrainState.create(variables, tx)
        key = jax.random.PRNGKey(0)
        losses = []
        for t in range(self.STEPS):
            state, metrics = step_fn(state, jnp.asarray(imgs[t]),
                                     jnp.asarray(labels[t]), key)
            losses.append(float(metrics['loss']))

        np.testing.assert_allclose(losses, ref_losses, rtol=1e-9)
        assert losses[0] != losses[-1]

        # final whole-tree state (params + BN buffers) matches
        sd = {k: v.detach().numpy()
              for k, v in ref_model.state_dict().items()}
        ref_vars = import_torch_weights(sd, state.variables())
        flat_ours = dict(
            ('/'.join(str(p) for p in path), leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                state.variables()))
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_vars)
        assert flat_ref
        for path, ref_leaf in flat_ref:
            k = '/'.join(str(p) for p in path)
            np.testing.assert_allclose(
                np.asarray(flat_ours[k]), np.asarray(ref_leaf),
                rtol=1e-7, atol=1e-9, err_msg=k)


# ---------------------------------------------------------------------------
# X3D
# ---------------------------------------------------------------------------

class TestX3DVsReferenceCode:
    T = 4

    def test_jax_matches_reference(self, f64, ref):
        torch.manual_seed(11)
        # zero_init_residual=False dodges a bug in the reference's OWN
        # init path: with its default (True) ``init_weights`` crashes on
        # ``constant_init(m.norm3, 0)`` — the attribute is ``bn3``
        # (``resnet_x3d.py:639-642``). Found by this oracle; see
        # docs/DESIGN.md round-5 notes.
        ref_model = ref.build_recognizer(
            dict(type='Recognizer3D',
                 backbone=dict(type='ResNet_X3D', depth=2.2, out_indices=(3,),
                               zero_init_residual=False,
                               inflate_style='mobile',  # ours' only style
                               norm_eval=False,
                               norm_cfg=dict(type='BN3d',
                                             requires_grad=True)),
                 cls_head=dict(type='I3DClsHead', spatial_size=-1,
                               temporal_size=-1, dropout_ratio=0.0,
                               in_channels=2048, num_classes=NUM_CLASSES)),
            train_cfg=None, test_cfg=dict(average_clips=None))
        perturb_bn(ref_model)
        ref_model = ref_model.double()

        flax_cfg = dict(
            type='Recognizer3D',
            backbone=dict(type='ResNet_X3D', depth=2.2, norm_eval=False,
                          norm_cfg=dict(type='BN3d', requires_grad=True)),
            cls_head=dict(type='I3DClsHead', spatial_size=-1,
                          temporal_size=-1, dropout_ratio=0.0,
                          in_channels=2048, num_classes=NUM_CLASSES),
            dtype=None)
        model, variables = to_jax_f64(
            ref_model, flax_cfg, (1, 1, self.T, HW, HW, 3))

        rng = np.random.RandomState(21)
        imgs = rng.randn(B, 1, self.T, HW, HW, 3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES, size=(B,)).astype(np.int64)
        compare_eval_and_train(ref, ref_model, model, variables, imgs,
                               labels)


# ---------------------------------------------------------------------------
# R(2+1)D
# ---------------------------------------------------------------------------

class TestR3DVsReferenceCode:
    T = 4

    def test_jax_matches_reference(self, f64, ref):
        torch.manual_seed(12)
        bb = dict(type='ResNet_R3D', depth=10, block_type='2.5d',
                  conv1_kernel_t=3, conv1_stride_t=1, use_pool1=False,
                  bn_eval=False, bn_frozen=False)
        head = dict(type='I3DClsHead', spatial_size=-1, temporal_size=-1,
                    dropout_ratio=0.0, in_channels=512,
                    num_classes=NUM_CLASSES)
        ref_model = ref.build_recognizer(
            dict(type='Recognizer3D', backbone=dict(bb), cls_head=dict(head)),
            train_cfg=None, test_cfg=dict(average_clips=None))
        perturb_bn(ref_model)
        ref_model = ref_model.double()

        flax_cfg = dict(type='Recognizer3D', backbone=dict(bb),
                        cls_head=dict(head), dtype=None)
        model, variables = to_jax_f64(
            ref_model, flax_cfg, (1, 1, self.T, HW, HW, 3))

        rng = np.random.RandomState(22)
        imgs = rng.randn(B, 1, self.T, HW, HW, 3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES, size=(B,)).astype(np.int64)
        compare_eval_and_train(ref, ref_model, model, variables, imgs,
                               labels)


# ---------------------------------------------------------------------------
# MobileNetV2 (2-D)
# ---------------------------------------------------------------------------

class TestMobileNetV2VsReferenceCode:
    T = 2

    def test_jax_matches_reference(self, f64, ref):
        torch.manual_seed(13)
        head = dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                    dropout_ratio=0.0, in_channels=1280, init_std=0.01,
                    num_classes=NUM_CLASSES)
        ref_model = ref.build_recognizer(
            dict(type='Recognizer2D',
                 backbone=dict(type='MobileNetV2'),
                 cls_head=dict(head)),
            train_cfg=None, test_cfg=dict(average_clips=None))
        perturb_bn(ref_model)
        ref_model = ref_model.double()

        flax_cfg = dict(type='Recognizer2D',
                        backbone=dict(type='MobileNetV2', norm_eval=False),
                        cls_head=dict(head), dtype=None)
        model, variables = to_jax_f64(
            ref_model, flax_cfg, (1, self.T, HW, HW, 3))

        rng = np.random.RandomState(23)
        imgs = rng.randn(B, self.T, HW, HW, 3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES, size=(B,)).astype(np.int64)
        compare_eval_and_train(ref, ref_model, model, variables, imgs,
                               labels)


# ---------------------------------------------------------------------------
# BNInception (2-D, caffe-converted TSN backbone)
# ---------------------------------------------------------------------------

class TestBNInceptionVsReferenceCode:
    T = 2

    def test_jax_matches_reference(self, f64, ref):
        torch.manual_seed(14)
        head = dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                    dropout_ratio=0.0, in_channels=1024, init_std=0.01,
                    num_classes=NUM_CLASSES)
        ref_model = ref.build_recognizer(
            dict(type='Recognizer2D',
                 backbone=dict(type='BNInception', bn_eval=False),
                 cls_head=dict(head)),
            train_cfg=None, test_cfg=dict(average_clips=None))
        perturb_bn(ref_model)
        ref_model = ref_model.double()

        flax_cfg = dict(type='Recognizer2D',
                        backbone=dict(type='BNInception', bn_eval=False),
                        cls_head=dict(head), dtype=None)
        model, variables = to_jax_f64(
            ref_model, flax_cfg, (1, self.T, 96, 96, 3))

        rng = np.random.RandomState(24)
        imgs = rng.randn(B, self.T, 96, 96, 3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES, size=(B,)).astype(np.int64)
        compare_eval_and_train(ref, ref_model, model, variables, imgs,
                               labels)


# ---------------------------------------------------------------------------
# InceptionV1_I3D
# ---------------------------------------------------------------------------

class TestInceptionV1I3DVsReferenceCode:
    T = 8

    def test_jax_matches_reference(self, f64, ref):
        torch.manual_seed(15)
        head = dict(type='I3DClsHead', spatial_size=-1, temporal_size=-1,
                    dropout_ratio=0.0, in_channels=1024,
                    num_classes=NUM_CLASSES)
        ref_model = ref.build_recognizer(
            dict(type='Recognizer3D',
                 backbone=dict(type='InceptionV1_I3D', bn_eval=False),
                 cls_head=dict(head)),
            train_cfg=None, test_cfg=dict(average_clips=None))
        perturb_bn(ref_model)
        ref_model = ref_model.double()

        flax_cfg = dict(type='Recognizer3D',
                        backbone=dict(type='InceptionV1_I3D', bn_eval=False),
                        cls_head=dict(head), dtype=None)
        model, variables = to_jax_f64(
            ref_model, flax_cfg, (1, 1, self.T, HW, HW, 3))

        rng = np.random.RandomState(25)
        imgs = rng.randn(B, 1, self.T, HW, HW, 3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES, size=(B,)).astype(np.int64)
        compare_eval_and_train(ref, ref_model, model, variables, imgs,
                               labels)


# ---------------------------------------------------------------------------
# CoST module inside ResNet (2-D recognizer)
# ---------------------------------------------------------------------------

class TestCoSTVsReferenceCode:
    T = 2

    def test_jax_matches_reference(self, f64, ref):
        torch.manual_seed(16)
        head = dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                    dropout_ratio=0.0, in_channels=2048, init_std=0.01,
                    num_classes=NUM_CLASSES)
        ref_model = ref.build_recognizer(
            dict(type='Recognizer2D',
                 backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                               norm_eval=False,
                               norm_cfg=dict(type='BN', requires_grad=True)),
                 cls_head=dict(head),
                 module_cfg=dict(type='CoST', n_segment=self.T,
                                 shift_freq=(0, 0, 1, 1))),
            train_cfg=None, test_cfg=dict(average_clips=None))
        perturb_bn(ref_model)
        ref_model = ref_model.double()

        flax_cfg = dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(head),
            module_cfg=dict(type='CoST', n_segment=self.T,
                            shift_freq=(0, 0, 1, 1)),
            dtype=None)
        model, variables = to_jax_f64(
            ref_model, flax_cfg, (1, self.T, HW, HW, 3))

        rng = np.random.RandomState(26)
        imgs = rng.randn(B, self.T, HW, HW, 3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES, size=(B,)).astype(np.int64)
        compare_eval_and_train(ref, ref_model, model, variables, imgs,
                               labels)


# ---------------------------------------------------------------------------
# MobileNetV2 + MVF surgery (recognizer2d.py:87-103): MVF wraps the first
# pointwise conv of every identity expansion InvertedResidual
# ---------------------------------------------------------------------------

class TestMobileNetV2MVFVsReferenceCode:
    T = 4

    @pytest.mark.parametrize('share', [False, True])
    def test_jax_matches_reference(self, f64, ref, share):
        torch.manual_seed(31 + share)
        head = dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                    dropout_ratio=0.0, in_channels=1280, init_std=0.01,
                    num_classes=NUM_CLASSES)
        module_cfg = dict(type='MVF', n_segment=self.T, alpha=0.5,
                          share=share, mode='THW')
        ref_model = ref.build_recognizer(
            dict(type='Recognizer2D',
                 backbone=dict(type='MobileNetV2'),
                 cls_head=dict(head), module_cfg=dict(module_cfg)),
            train_cfg=None, test_cfg=dict(average_clips=None))
        # the surgery actually wrapped conv[0]s
        assert any('conv.0.shift_conv' in n
                   for n, _ in ref_model.named_parameters())
        perturb_bn(ref_model)
        ref_model = ref_model.double()

        flax_cfg = dict(type='Recognizer2D',
                        backbone=dict(type='MobileNetV2', norm_eval=False),
                        cls_head=dict(head),
                        module_cfg=dict(module_cfg), dtype=None)
        model, variables = to_jax_f64(
            ref_model, flax_cfg, (1, self.T, HW, HW, 3))

        rng = np.random.RandomState(37 + share)
        imgs = rng.randn(B, self.T, HW, HW, 3).astype(np.float64) * 0.5
        labels = rng.randint(0, NUM_CLASSES, size=(B,)).astype(np.int64)
        compare_eval_and_train(ref, ref_model, model, variables, imgs,
                               labels)

    def test_import_report_complete(self, f64, ref):
        """Importer vocabulary completeness for the MVF-wrapped MobileNetV2
        names (``features.K.conv.0.{net,shift_conv,h_conv,w_conv,bn}.*``)."""
        torch.manual_seed(41)
        head = dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                    dropout_ratio=0.0, in_channels=1280, init_std=0.01,
                    num_classes=NUM_CLASSES)
        module_cfg = dict(type='MVF', n_segment=self.T, alpha=0.5,
                          share=False, mode='THW')
        ref_model = ref.build_recognizer(
            dict(type='Recognizer2D', backbone=dict(type='MobileNetV2'),
                 cls_head=dict(head), module_cfg=dict(module_cfg)),
            train_cfg=None, test_cfg=dict(average_clips=None))
        model = build_recognizer(
            dict(type='Recognizer2D',
                 backbone=dict(type='MobileNetV2', norm_eval=False),
                 cls_head=dict(head), module_cfg=dict(module_cfg),
                 dtype=None),
            test_cfg=dict(average_clips=None))
        variables = model.init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(1)},
            jnp.zeros((1, self.T, HW, HW, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32), return_loss=True, train=True)
        sd = {k: v.detach().numpy()
              for k, v in ref_model.state_dict().items()}
        _, report = import_torch_weights(sd, variables, return_report=True)
        assert not report['unexpected'], report['unexpected'][:5]
        assert not report['missing'], report['missing'][:5]


class TestReferenceTSMImportBug:
    def test_tsm_surgery_is_unrunnable(self, ref):
        """Reference bug #4 (found by executing it): the MobileNetV2+TSM
        surgery does ``from ..modules import TemporalShift``
        (recognizer2d.py:73-75), but ``TemporalShift`` exists nowhere in the
        reference repo — ``codes/models/modules/__init__.py`` is empty and
        no module file defines it. Every TSM-on-MobileNetV2 construction
        raises ImportError; the reference TSM path was never runnable. Our
        ``modules/tsm.py`` implements the evident TSM-paper semantics (and
        runs: tests/test_models_breadth.py)."""
        with pytest.raises(ImportError):
            ref.build_recognizer(
                dict(type='Recognizer2D',
                     backbone=dict(type='MobileNetV2'),
                     cls_head=dict(type='TSNClsHead', spatial_size=-1,
                                   spatial_type='avg', dropout_ratio=0.0,
                                   in_channels=1280, num_classes=NUM_CLASSES),
                     module_cfg=dict(type='tsm', n_segment=4, n_div=8)),
                train_cfg=None, test_cfg=dict(average_clips=None))
