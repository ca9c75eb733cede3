"""Parity for hand-rolled pieces: MVF's inline BatchNorm (train-mode batch
stats + running-stat updates) vs torch BatchNorm3d, and cross-entropy loss
vs torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp


class TestMVFBatchNormParity:
    def test_train_step_stats_match_torch(self):
        """One train-mode MVF call must normalize with biased batch variance
        and update running stats with unbiased variance at momentum 0.1 —
        exactly torch BatchNorm3d semantics (MVF.py's self.bn)."""
        from mvfnet_tpu.models.modules.mvf import MVF
        N, T, H, W, C = 2, 4, 5, 6, 8
        cs = C // 2
        rng = np.random.RandomState(0)
        x = rng.randn(N * T, H, W, C).astype(np.float32)

        mvf = MVF(n_segment=T, in_channels=C, alpha=0.5, mode='THW')
        variables = mvf.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             train=False)
        params = variables['params']

        # torch reference on the same conv-sum output
        from mvfnet_tpu.ops.mvf import mvf_conv_sum
        x5 = jnp.asarray(x).reshape(N, T, H, W, C)
        y = mvf_conv_sum(x5[..., :cs], params['shift_conv'],
                         params['h_conv'], params['w_conv'], 'THW')
        y_t = torch.from_numpy(np.asarray(y)).permute(0, 4, 1, 2, 3)

        bn = torch.nn.BatchNorm3d(cs, eps=1e-5, momentum=0.1)
        with torch.no_grad():
            bn.running_mean.normal_(0, 0.3)
            bn.running_var.uniform_(0.5, 1.5)
        # seed our running stats with torch's
        variables = {
            'params': params,
            'batch_stats': {
                'bn_mean': jnp.asarray(bn.running_mean.numpy().copy()),
                'bn_var': jnp.asarray(bn.running_var.numpy().copy()),
            },
        }
        bn.train()
        ref_norm = bn(y_t)

        out, new_vars = mvf.apply(variables, jnp.asarray(x), train=True,
                                  mutable=['batch_stats'])
        # running stats after one step
        np.testing.assert_allclose(
            np.asarray(new_vars['batch_stats']['bn_mean']),
            bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_vars['batch_stats']['bn_var']),
            bn.running_var.numpy(), rtol=1e-5, atol=1e-6)
        # normalized output (gamma=1, beta=0 at init -> hswish(ref_norm))
        ref_act = (ref_norm * F.relu6(ref_norm + 3) / 6)
        ref_act = ref_act.permute(0, 2, 3, 4, 1).detach().numpy()
        ours = np.asarray(out).reshape(N, T, H, W, C)[..., :cs]
        np.testing.assert_allclose(ours, ref_act, rtol=1e-4, atol=1e-5)


class TestLossParity:
    def test_cross_entropy_matches_torch(self):
        from mvfnet_tpu.models.heads.tsn_head import TSNClsHead
        rng = np.random.RandomState(1)
        logits = rng.randn(6, 10).astype(np.float32)
        labels = rng.randint(0, 10, size=6)
        ours = TSNClsHead.loss(jnp.asarray(logits),
                               jnp.asarray(labels))['loss_cls']
        ref = F.cross_entropy(torch.from_numpy(logits),
                              torch.from_numpy(labels)).item()
        assert float(ours) == pytest.approx(ref, rel=1e-6)
