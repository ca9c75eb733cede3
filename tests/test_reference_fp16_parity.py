"""Oracle closure part 7: the reference fp16 subsystem EXECUTES, and the
bf16 policy decision is pinned against it.

The reference trains mixed precision with ``Fp16OptimizerHook``
(``core/fp16/hooks.py:12-97``): static loss scale 512, fp32 master
weights, fp16 model copy, norm layers patched back to fp32. Our framework
replaced the whole subsystem with "bf16 compute / fp32 params, no loss
scaling" (COVERAGE §2.6; drift-band evidence in tests/test_bf16_policy.py).
This module runs the reference's OWN machinery on CPU and asserts:

1. ``wrap_fp16_model`` semantics (conv/linear halved, norms kept fp32,
   ``fp16_enabled`` set) — the structure our ``compute_dtype`` policy maps
   onto TPU (params fp32, activations bf16, BN stats fp32).
2. One full ``after_train_iter`` produces EXACTLY the update
   ``master -= lr * (fp16_grad / scale)`` with the fp16 model refreshed
   from the master copy — i.e. the subsystem is numerically equivalent to
   plain SGD on the unscaled grads, which is what our compiled train step
   does directly in fp32 params.
3. The reason the reference NEEDS the scale and bf16 does not, measured
   with the reference's own hook: tiny gradients (~1e-6) flush to zero in
   an unscaled fp16 backward (fp16 min normal 6.1e-5), survive with
   loss_scale=512, and survive UNSCALED in bf16 (8-bit exponent) within
   bf16 resolution of the f32 gradients. This is the executable form of
   the shipped "no loss scaling needed" claim.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from reference_loader import load_reference_fp16


@pytest.fixture(scope='module')
def fp16():
    return load_reference_fp16()


class _ToyNet(nn.Module):
    """Conv+BN+ReLU+Linear: covers the halved and the norm-patched paths."""

    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(3, 4, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(4)
        self.fc = nn.Linear(4, 2)

    def forward(self, x):
        h = torch.relu(self.bn(self.conv(x)))
        return self.fc(h.mean(dim=(2, 3)))


class _Runner:
    def __init__(self, model, optimizer):
        self.model = model
        self.optimizer = optimizer
        self.outputs = {}


def _make(seed=0):
    torch.manual_seed(seed)
    model = _ToyNet()
    opt = torch.optim.SGD(model.parameters(), lr=0.1, momentum=0.0)
    return model, opt


class TestWrapFp16Model:
    def test_halved_except_norms(self, fp16):
        model, _ = _make()
        fp16.wrap_fp16_model(model)
        assert model.conv.weight.dtype == torch.half
        assert model.fc.weight.dtype == torch.half
        # patch_norm_fp32 converts norm layers back (hooks.py:119-136)
        assert model.bn.weight.dtype == torch.float32
        assert model.bn.running_mean.dtype == torch.float32


class TestFp16HookStep:
    def test_step_equals_sgd_on_unscaled_grads(self, fp16):
        """Execute before_run + after_train_iter and reproduce the update
        by hand: the subsystem must reduce to master -= lr * grad, grads
        taken from the scaled fp16 backward divided by the scale — the
        exact contract our fp32-param train step implements without the
        scaffolding."""
        scale = 512.0
        model, opt = _make(seed=1)
        master_before = [p.detach().clone() for p in model.parameters()]

        hook = fp16.Fp16OptimizerHook(loss_scale=scale, distributed=False)
        runner = _Runner(model, opt)
        hook.before_run(runner)  # deepcopy master + halve model

        fp32_weights = []
        for g in opt.param_groups:
            fp32_weights += g['params']
        # master copy is fp32 and independent of the halved model params
        assert all(w.dtype == torch.float32 for w in fp32_weights)
        assert model.conv.weight.dtype == torch.half

        torch.manual_seed(7)
        x = torch.randn(4, 3, 8, 8).half()
        model.train()
        loss = model(x).square().mean()
        runner.outputs['loss'] = loss
        hook.after_train_iter(runner)

        # reproduce: grads are the fp16 backward of (loss * scale),
        # copied to fp32, divided by scale, then SGD(lr) on the master
        model2, _ = _make(seed=1)
        for p2, m in zip(model2.parameters(), master_before):
            assert torch.equal(p2.detach(), m)
        fp16.wrap_fp16_model(model2)
        torch.manual_seed(7)
        x2 = torch.randn(4, 3, 8, 8).half()
        model2.train()
        (model2(x2).square().mean() * scale).backward()
        for got_master, start, p2 in zip(fp32_weights, master_before,
                                         model2.parameters()):
            want = start - 0.1 * (p2.grad.float() / scale)
            torch.testing.assert_close(got_master, want, rtol=0, atol=0)
        # and the model was refreshed from the master (hooks.py:96-97);
        # copy_ casts into each param's own dtype (BN params stay fp32
        # under patch_norm_fp32, conv/fc are half)
        for model_p, master in zip(model.parameters(), fp32_weights):
            torch.testing.assert_close(
                model_p.detach(), master.detach().to(model_p.dtype),
                rtol=0, atol=0)


class TestWhyBf16NeedsNoScale:
    """The policy-decision pin: same tiny-gradient problem, three regimes,
    the fp16 ones executed through the reference's own hook."""

    LOSS_MUL = 1e-6  # pushes grads below fp16 min normal (6.1e-5)

    def _run_reference_hook(self, fp16, scale):
        model, opt = _make(seed=3)
        hook = fp16.Fp16OptimizerHook(loss_scale=scale, distributed=False)
        runner = _Runner(model, opt)
        hook.before_run(runner)
        torch.manual_seed(11)
        x = torch.randn(4, 3, 8, 8).half()
        model.train()
        runner.outputs['loss'] = model(x).square().mean() * self.LOSS_MUL
        hook.after_train_iter(runner)
        fp32_weights = []
        for g in opt.param_groups:
            fp32_weights += g['params']
        return [w.grad.detach().clone() for w in fp32_weights]

    def _run_plain(self, dtype):
        model, _ = _make(seed=3)
        if dtype is not torch.float32:
            model = model.to(dtype)
            fp16_mod = load_reference_fp16()
            fp16_mod.patch_norm_fp32(model)
        torch.manual_seed(11)
        x = torch.randn(4, 3, 8, 8).to(dtype)
        model.train()
        (model(x).square().mean() * self.LOSS_MUL).backward()
        return [p.grad.detach().float().clone() for p in model.parameters()]

    def test_fp16_underflows_unscaled_but_not_at_512(self, fp16):
        f32 = self._run_plain(torch.float32)
        unscaled = self._run_reference_hook(fp16, scale=1.0)
        scaled = self._run_reference_hook(fp16, scale=512.0)

        flat_f32 = torch.cat([g.reshape(-1) for g in f32])
        flat_un = torch.cat([g.reshape(-1) for g in unscaled])
        flat_sc = torch.cat([g.reshape(-1) for g in scaled])
        nz = flat_f32.abs() > 0

        # unscaled fp16: the bulk of real gradient mass is lost
        lost_un = ((flat_un == 0) & nz).float().mean()
        lost_sc = ((flat_sc == 0) & nz).float().mean()
        assert lost_un > 0.5, f'expected underflow, lost={lost_un}'
        # the reference's 512 scale rescues it
        assert lost_sc < lost_un / 4, (lost_sc, lost_un)
        rel_sc = ((flat_sc - flat_f32).norm() / flat_f32.norm()).item()
        assert rel_sc < 0.05, rel_sc

    def test_bf16_needs_no_scale(self):
        """bf16 backward at scale 1 tracks f32 within bf16 resolution —
        the executable justification for shipping bf16 without the
        reference's loss-scaling subsystem."""
        f32 = self._run_plain(torch.float32)
        bf16 = self._run_plain(torch.bfloat16)
        flat_f32 = torch.cat([g.reshape(-1) for g in f32])
        flat_bf = torch.cat([g.reshape(-1) for g in bf16])
        nz = flat_f32.abs() > 0
        lost = ((flat_bf == 0) & nz).float().mean()
        assert lost < 0.02, f'bf16 should not underflow, lost={lost}'
        rel = ((flat_bf - flat_f32).norm() / flat_f32.norm()).item()
        assert rel < 0.05, rel
