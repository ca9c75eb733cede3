"""MVF op numerics: jnp composition vs a torch depthwise-Conv3d oracle.

The torch oracle re-creates the reference MVF math
(``/root/reference/codes/models/modules/MVF.py:104-138``) from torch
functional primitives — three grouped Conv3d's + BatchNorm3d + hardswish on
NCTHW — and is compared against our channels-last implementation.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mvfnet_tpu.ops.mvf import dw3, hard_swish, mvf_conv_sum

N, T, H, W, C = 2, 4, 6, 5, 8


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def torch_dw3(x_ncthw, w3c, axis):
    """Depthwise 3-tap conv along axis (2=T,3=H,4=W) via torch conv3d."""
    c = x_ncthw.shape[1]
    ks = [1, 1, 1]
    ks[axis - 2] = 3
    pad = [k // 2 for k in ks]
    # torch weight layout: (C, 1, kT, kH, kW); our (3, C) taps -> kernel
    weight = torch.zeros(c, 1, *ks)
    for k in range(3):
        pos = [0, 0, 0]
        pos[axis - 2] = k
        weight[:, 0, pos[0], pos[1], pos[2]] = torch.from_numpy(w3c[k])
    return F.conv3d(x_ncthw, weight, padding=pad, groups=c)


class TestDw3VsTorch:
    @pytest.mark.parametrize('axis', [1, 2, 3])
    def test_matches_torch_depthwise_conv(self, axis):
        x = _rand((N, T, H, W, C), seed=axis)
        w = _rand((3, C), seed=100 + axis)
        ours = np.asarray(dw3(jnp.asarray(x), jnp.asarray(w), axis=axis))

        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCTHW
        ref = torch_dw3(xt, w, axis=axis + 1)            # T/H/W -> 2/3/4
        ref = ref.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


class TestConvSum:
    @pytest.mark.parametrize('mode', ['T', 'TH', 'THW'])
    def test_mode_selection(self, mode):
        x = jnp.asarray(_rand((N, T, H, W, C), seed=0))
        wt = jnp.asarray(_rand((3, C), seed=1))
        wh = jnp.asarray(_rand((3, C), seed=2))
        ww = jnp.asarray(_rand((3, C), seed=3))
        y = mvf_conv_sum(x, wt, wh, ww, mode=mode)
        expect = dw3(x, wt, 1)
        if mode in ('TH', 'THW'):
            expect = expect + dw3(x, wh, 2)
        if mode == 'THW':
            expect = expect + dw3(x, ww, 3)
        np.testing.assert_allclose(np.asarray(y), np.asarray(expect),
                                   rtol=1e-6)

    def test_share_semantics(self):
        """share=True == passing the T weights for all views
        (MVF.py:114-116)."""
        x = jnp.asarray(_rand((N, T, H, W, C), seed=0))
        wt = jnp.asarray(_rand((3, C), seed=1))
        y_share = mvf_conv_sum(x, wt, wt, wt, mode='THW')
        y_manual = dw3(x, wt, 1) + dw3(x, wt, 2) + dw3(x, wt, 3)
        np.testing.assert_allclose(np.asarray(y_share), np.asarray(y_manual),
                                   rtol=1e-6)


class TestHardSwish:
    def test_matches_torch_reference_formula(self):
        # reference HardSwish = x * relu6(x+3)/6 (se_module.py:5-24)
        x = np.linspace(-5, 5, 101).astype(np.float32)
        ours = np.asarray(hard_swish(jnp.asarray(x)))
        ref = (torch.from_numpy(x) *
               F.relu6(torch.from_numpy(x) + 3) / 6).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


class TestFullMVF:
    def test_full_mvf_against_torch_oracle(self):
        """End-to-end MVF transform (split + taps + BN-eval + hswish +
        concat) vs the torch-composed oracle."""
        alpha = 0.5
        cs = int(C * alpha)
        x = _rand((N * T, H, W, C), seed=20)
        wt, wh, ww = (_rand((3, cs), s) for s in (21, 22, 23))
        gamma, beta = _rand((cs,), 24), _rand((cs,), 25)
        mean, var = _rand((cs,), 26), np.abs(_rand((cs,), 27)) + 0.5

        # --- ours (channels-last) ---
        x5 = jnp.asarray(x).reshape(N, T, H, W, C)
        xs, xu = x5[..., :cs], x5[..., cs:]
        y = mvf_conv_sum(xs, *map(jnp.asarray, (wt, wh, ww)), mode='THW')
        scale = gamma / np.sqrt(var + 1e-5)
        bias = beta - mean * scale
        y = y * scale + bias
        y = hard_swish(y)
        ours = jnp.concatenate([y, xu], -1).reshape(N * T, H, W, C)

        # --- torch oracle (NCTHW, like the reference module) ---
        xt = torch.from_numpy(x).reshape(N, T, H, W, C)
        xt = xt.permute(0, 4, 1, 2, 3)  # N C T H W
        xs_t, xu_t = xt[:, :cs], xt[:, cs:]
        yt = (torch_dw3(xs_t, wt, 2) + torch_dw3(xs_t, wh, 3)
              + torch_dw3(xs_t, ww, 4))
        yt = F.batch_norm(yt, torch.from_numpy(mean), torch.from_numpy(var),
                          torch.from_numpy(gamma), torch.from_numpy(beta),
                          training=False, eps=1e-5)
        yt = yt * F.relu6(yt + 3) / 6
        ref = torch.cat([yt, xu_t], dim=1)
        ref = ref.permute(0, 2, 3, 4, 1).reshape(N * T, H, W, C).numpy()

        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4,
                                   atol=1e-5)
