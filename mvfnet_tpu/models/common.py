"""Shared model building blocks (norm factory, conv helpers, SE, activations).

TPU-native replacements for the reference's ``codes/models/common/``
(``conv_module.py``, ``norm.py:28-71``, ``se_module.py:5-67``): channels-last
Flax modules with fp32 params and a configurable compute dtype.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.mvf import hard_sigmoid, hard_swish  # noqa: F401 (re-export)

Dtype = Any

# torch BatchNorm defaults: eps=1e-5, momentum=0.1 (new stats weight).
# flax momentum is the *old* stats weight -> 0.9.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch running-stat semantics.

    Drop-in for ``flax.linen.BatchNorm`` (same variable tree: params
    scale/bias, batch_stats mean/var; same ``use_running_average`` call
    convention) with two torch-parity fixes flax does not offer:

    - the running variance stores the UNBIASED batch variance
      (``var * n/(n-1)``), exactly torch ``_BatchNorm`` (flax stores the
      biased one — a per-step ``var/(n-1)`` drift that the f64 train
      trajectory tests resolve, and that skews every eval after a real
      training run);
    - batch statistics are computed in ``promote_types(f32, x.dtype)``:
      bf16 still promotes to f32, but f64 input keeps f64 (flax would
      also hold f32 here).

    Normalization itself uses the biased batch variance in train mode
    (torch does too); only the stored EMA differs. Variance uses the
    stable two-pass form ``E[(x-mean)^2]`` — see the use_fast_variance
    note that used to live here (SyncBN divergence across mesh
    shardings, tests/test_multichip_equivalence.py).
    """
    use_running_average: Optional[bool] = None
    momentum: float = BN_MOMENTUM  # weight of the OLD stats (flax style)
    epsilon: float = BN_EPS
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: Optional[bool] = None) -> jnp.ndarray:
        ura = nn.merge_param('use_running_average',
                             self.use_running_average, use_running_average)
        f = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (f,),
                           self.param_dtype)
        bias = self.param('bias', nn.initializers.zeros, (f,),
                          self.param_dtype)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((f,), jnp.float32))
        stat_dtype = jnp.promote_types(jnp.float32, x.dtype)
        xf = x.astype(stat_dtype)
        if ura:
            mean = ra_mean.value.astype(stat_dtype)
            var = ra_var.value.astype(stat_dtype)
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if not self.is_initializing():
                count = x.size // f
                unbiased = var * (count / max(count - 1, 1))
                m = self.momentum
                ra_mean.value = (m * ra_mean.value.astype(mean.dtype)
                                 + (1 - m) * mean)
                ra_var.value = (m * ra_var.value.astype(var.dtype)
                                + (1 - m) * unbiased)
        inv = scale.astype(stat_dtype) / jnp.sqrt(var + self.epsilon)
        y = (xf - mean) * inv + bias.astype(stat_dtype)
        out_dtype = self.dtype if self.dtype is not None else stat_dtype
        return y.astype(out_dtype)


def make_norm(norm_cfg: Optional[Dict[str, Any]],
              *,
              name: str,
              dtype: Dtype = jnp.float32) -> Callable:
    """Build a norm layer from a ``dict(type='BN'|'GN'|'SyncBN', ...)`` node.

    Mirrors the reference factory (``codes/models/common/norm.py:28-71``).
    ``requires_grad`` is an optimizer-mask concern in JAX and handled by the
    training engine, not here. Returns an *unapplied* linen module; BatchNorm
    instances must be called with ``use_running_average``.
    """
    cfg = dict(norm_cfg or {'type': 'BN'})
    norm_type = cfg.pop('type', 'BN')
    cfg.pop('requires_grad', None)
    if norm_type in ('BN', 'BN3d', 'SyncBN'):
        return TorchBatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                              dtype=dtype, name=name, **cfg)
    if norm_type == 'GN':
        num_groups = cfg.pop('num_groups')
        return nn.GroupNorm(num_groups=num_groups, epsilon=BN_EPS,
                            dtype=dtype, param_dtype=jnp.float32, name=name,
                            **cfg)
    raise KeyError(f'Unrecognized norm type {norm_type}')


def conv2d(features: int,
           kernel_size: int | Tuple[int, int],
           *,
           stride: int | Tuple[int, int] = 1,
           padding: int | Tuple[int, int] | str = 0,
           dilation: int = 1,
           use_bias: bool = False,
           name: Optional[str] = None,
           dtype: Dtype = jnp.float32,
           quant: Optional[str] = None,
           carry_out: bool = False) -> nn.Module:
    """torch-semantics Conv2d on NHWC input (explicit symmetric padding).

    ``quant='int8'`` swaps in :class:`QuantConv2d` (same param tree) —
    eval-only int8 MXU path, see that class's docstring. ``carry_out``
    (quant only) returns the :class:`IntCarry` accumulator for the
    integer-carry pipeline."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    if quant in ('int8', 'int8_static'):
        return QuantConv2d(features=features, kernel_size=kernel_size,
                           strides=stride, padding=padding,
                           dilation=dilation, use_bias=use_bias,
                           static=(quant == 'int8_static'),
                           carry_out=carry_out,
                           dtype=dtype, name=name)
    if carry_out:
        raise ValueError('carry_out requires a quant mode')
    if quant is not None:
        raise ValueError(f'unknown quant mode {quant!r}')
    return nn.Conv(features=features, kernel_size=kernel_size,
                   strides=stride, padding=padding,
                   kernel_dilation=(dilation, dilation),
                   use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32,
                   name=name)


def _act_quant(mod: nn.Module, stat_name: str, xf: jnp.ndarray,
               static: bool):
    """Shared activation-quantization helper for int8 conv modules.

    Returns ``(scale, int8_tensor)``. Records/reads the per-tensor abs-max
    in the ``quant_stats`` collection (see :class:`QuantConv2d`)."""
    if mod.is_mutable_collection('quant_stats'):
        # init / calibration pass: measure and record (both modes). The
        # 'calibrated' marker distinguishes a real calibration apply from
        # model.init (whose input is usually zeros/random): static eval
        # with init-only scales would silently saturate activations, so
        # check_quant_calibrated() raises on marker==0 before eval runs.
        qs = mod.variable('quant_stats', stat_name,
                          lambda: jnp.zeros((), jnp.float32))
        cal = mod.variable('quant_stats', f'{stat_name}_calibrated',
                           lambda: jnp.zeros((), jnp.float32))
        if not mod.is_initializing():
            cal.value = jnp.ones((), jnp.float32)
        amax = jnp.max(jnp.abs(xf))
        qs.value = jnp.maximum(qs.value, amax)
        sx = jnp.maximum(amax / 127.0, 1e-12)
    elif static:
        if not mod.has_variable('quant_stats', stat_name):
            raise ValueError(
                "quant='int8_static' needs calibrated activation scales: "
                "init (or apply with mutable=['quant_stats']) on "
                'representative batches first, and pass the resulting '
                "'quant_stats' collection in the variables")
        qs = mod.variable('quant_stats', stat_name,
                          lambda: jnp.zeros((), jnp.float32))
        sx = jnp.maximum(qs.value / 127.0, 1e-12)
    else:
        # dynamic mode needs no stored state — works with plain fp32
        # checkpoint variables that carry no 'quant_stats' collection
        sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return sx, xq


class IntCarry(NamedTuple):
    """An int32 conv accumulator carried between adjacent quantized convs.

    ``acc`` is the raw MXU int32 output of the producing conv; ``scale``
    is its per-output-channel dequantization factor (``sx * sw``). The
    consuming :class:`QuantConv2d` folds the intervening BN affine + ReLU
    + its own input quantization into ONE elementwise pass over ``acc``
    (int32 -> int8), instead of dequantize -> BN -> relu -> requantize
    round trips through the compute dtype — the "requant HBM tax"
    measured in DESIGN.md ("Int8 in-situ gap profiled").
    """
    acc: jnp.ndarray     # int32, NHWC
    scale: jnp.ndarray   # f32, (C,)


def bn_affine(scale, bias, mean, var, eps: float = BN_EPS):
    """Eval-mode BatchNorm as a per-channel affine: y = a*x + b."""
    a = scale / jnp.sqrt(var + eps)
    return a, bias - a * mean


class QuantConv2d(nn.Module):
    """Int8-quantized eval conv, checkpoint-compatible with ``nn.Conv``.

    v5e's int8 MXU path measured 1.7-2.5x the bf16 conv emitter at this
    model family's shapes (DESIGN.md "Int8 dense-test" table). Scheme:
    per-output-channel symmetric weight scales (computed from the fp32
    ``kernel`` param, so any imported checkpoint works unchanged) and a
    per-tensor symmetric activation scale; conv accumulates in int32 and
    the output rescales to the compute dtype, where BN/relu fuse as usual.

    Activation scale, two modes:
    - dynamic (``static=False``): ``max|x|`` computed per call — no
      calibration needed, but the reduction costs extra HBM passes per
      conv (measured 26% e2e regression vs bf16). Whenever the
      ``quant_stats`` collection is mutable (init, or an explicit
      calibration ``apply``), the running max is recorded there.
    - static (``static=True``): reads the recorded ``act_amax`` — no
      reduction on the hot path. Calibrate by initializing (or applying
      with ``mutable=['quant_stats']``) on representative batches first.

    Integer carry (``carry_out`` / :class:`IntCarry` input): with static
    scales, adjacent quantized convs exchange int8 activations directly.
    A conv called with ``carry_out=True`` returns the raw int32
    accumulator + its dequant scale; the next conv receives that
    :class:`IntCarry` plus the intervening BN's eval affine
    (``prev_affine=(a, b)``) and performs fold + ReLU + requantization as
    one int32->int8 pass using its own calibrated ``act_amax`` — no
    float-domain round trip. Mathematically identical to the unfused
    path (same scales, same rounding points, ReLU commutes with the
    positive scale; the only difference is the f32-vs-compute-dtype
    precision of the intermediate, which is *higher* here). Requires
    ``static=True`` and a prior calibration pass (the unfused path runs
    during calibration so ``act_amax`` records the true conv input).
    Measured e2e-NEGATIVE on TPU (~-3.5%, replicated): XLA already fuses
    the literal dequant->BN->relu->requant chain, so the manual fold only
    reshuffles an already-fused program — off by default, kept as tested
    apparatus (DESIGN.md "Int8 integer carry (round 4): refuted").

    Eval-only — gradients through the rounding are meaningless and the
    owning backbone must reject train mode.
    """
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dilation: int = 1
    use_bias: bool = False
    static: bool = False
    carry_out: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, prev_affine=None):
        import jax
        in_ch = (x.acc if isinstance(x, IntCarry) else x).shape[-1]
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            self.kernel_size + (in_ch, self.features), jnp.float32)
        # per-output-channel symmetric weight quantization
        sw = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0
        sw = jnp.maximum(sw, 1e-12)
        wq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
        if isinstance(x, IntCarry):
            # fold previous BN + ReLU + our input quantization into one
            # int32 -> int8 pass (see class docstring)
            if not self.static or prev_affine is None:
                raise ValueError('IntCarry input needs static=True and the '
                                 'previous BN affine')
            if not self.has_variable('quant_stats', 'act_amax'):
                raise ValueError(
                    "int8 carry needs calibrated activation scales: apply "
                    "with mutable=['quant_stats'] on representative batches "
                    'first (the unfused path runs during calibration)')
            qs = self.variable('quant_stats', 'act_amax',
                               lambda: jnp.zeros((), jnp.float32))
            sx = jnp.maximum(qs.value / 127.0, 1e-12)
            a, b = prev_affine
            m = (a * x.scale) / sx                       # (C_in,)
            z = x.acc.astype(jnp.float32) * m + (b / sx)
            # ReLU folds into the lower clip bound (sx > 0)
            xq = jnp.clip(jnp.round(z), 0, 127).astype(jnp.int8)
        else:
            # per-tensor symmetric activation quantization
            xf = x.astype(jnp.float32)
            sx, xq = _act_quant(self, 'act_amax', xf, self.static)
        y = jax.lax.conv_general_dilated(
            xq, wq, self.strides, self.padding,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        if self.carry_out:
            if self.use_bias:
                raise ValueError('carry_out with bias is unsupported')
            return IntCarry(y, sx * sw)
        out = y.astype(jnp.float32) * (sx * sw)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias
        return out.astype(self.dtype)


class QuantConv3d(nn.Module):
    """Int8-quantized eval Conv3d, checkpoint-compatible with ``nn.Conv``.

    3-D sibling of :class:`QuantConv2d` (same scheme: per-output-channel
    symmetric weight scales from the fp32 ``kernel`` param, per-tensor
    activation scale, int32 accumulation, rescale to compute dtype).
    Motivation: the conv3d int8 microbench (DESIGN.md "Round-3
    candidates") — spatial 1x3x3 convs +41% in int8, temporal 3x1x1
    convs lose — so the owning backbones gate which conv *types* route
    here (``quant_ops``); this class itself is type-agnostic.
    """
    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = ((0, 0), (0, 0), (0, 0))
    dilation: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = False
    static: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax
        in_ch = x.shape[-1]
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (in_ch, self.features), jnp.float32)
        sw = jnp.max(jnp.abs(kernel), axis=(0, 1, 2, 3)) / 127.0
        sw = jnp.maximum(sw, 1e-12)
        wq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        sx, xq = _act_quant(self, 'act_amax', xf, self.static)
        y = jax.lax.conv_general_dilated(
            xq, wq, self.strides, self.padding,
            rhs_dilation=tuple(self.dilation),
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (sx * sw)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias
        return out.astype(self.dtype)


def quant_conv3d_type(kernel: Tuple[int, int, int]) -> str:
    """Classify a conv3d kernel for per-layer-TYPE quant masking:
    'temporal' (kt>1), 'spatial' (kt==1, spatial extent >1), or
    'pointwise' (1x1x1)."""
    kt, kh, kw = kernel
    if kt > 1:
        return 'temporal'
    if max(kh, kw) > 1:
        return 'spatial'
    return 'pointwise'


def check_quant_calibrated(model, variables) -> None:
    """Refuse to run an ``int8_static`` eval on init-only activation scales.

    ``model.init`` records abs-max from the init input (often zeros), so an
    uncalibrated static eval would silently use garbage scales. Calibration
    passes (``apply(..., mutable=['quant_stats'])`` outside init) set the
    per-conv 'calibrated' markers; this checks them host-side before the
    jitted eval step runs (inside jit the values are tracers and cannot
    gate a raise). No-op for non-static or quant-free models.
    """
    bb = getattr(model, 'backbone', None)
    if not isinstance(bb, dict) or bb.get('quant') != 'int8_static':
        return
    qs = variables.get('quant_stats') if hasattr(variables, 'get') else None
    markers = []

    def _walk(node):
        if hasattr(node, 'items'):
            for k, v in node.items():
                if k.endswith('calibrated'):
                    markers.append(v)
                else:
                    _walk(v)

    _walk(qs or {})
    import numpy as np
    try:
        uncal = not markers or not all(float(np.asarray(m)) > 0
                                       for m in markers)
    except Exception:
        return  # traced values: cannot check here
    if uncal:
        raise ValueError(
            "quant='int8_static' needs calibrated activation scales: run "
            "apply(..., mutable=['quant_stats']) on representative batches "
            'first (test_recognizer.py does this automatically via '
            '--calib_videos) and pass the updated quant_stats collection')


def max_pool_same_as_torch(x: jnp.ndarray, window: int, stride: int,
                           padding: int) -> jnp.ndarray:
    """torch MaxPool2d(window, stride, padding) on NHWC input.

    torch pads with -inf implicitly (padding never wins the max)."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)))


def avg_pool_torch(x: jnp.ndarray, window: int, stride: int, padding: int = 0,
                   count_include_pad: bool = True,
                   ceil_mode: bool = False) -> jnp.ndarray:
    """torch AvgPool2d semantics on NHWC input.

    Only the configurations the reference uses are supported:
    - ``AvgPool2d(3, stride, padding=1)`` (avd layer, count_include_pad=True)
    - ``AvgPool2d(k, k, ceil_mode=True, count_include_pad=False)`` (avg_down)
    """
    if ceil_mode:
        h, w = x.shape[1], x.shape[2]
        pad_h = (-(h - window) % stride) if h > window else 0
        pad_w = (-(w - window) % stride) if w > window else 0
    else:
        pad_h = pad_w = 0
    pads = ((padding, padding + pad_h), (padding, padding + pad_w))
    summed = nn.pool(x, 0.0, jnp.add, (window, window), (stride, stride), pads)
    if count_include_pad and not ceil_mode:
        return summed / (window * window)
    ones = jnp.ones(x.shape[1:3] + (1,), x.dtype)[None]
    counts = nn.pool(ones, 0.0, jnp.add, (window, window), (stride, stride),
                     pads)
    return summed / counts


class SEModule(nn.Module):
    """Squeeze-and-excitation on channels-last input of any spatial rank.

    Covers both the reference's SE2D and SE3D (``se_module.py:27-67``):
    global-average over all non-channel, non-batch axes -> fc1 -> relu ->
    fc2 -> (hard)sigmoid -> scale.
    """
    channels: int
    reduction: int = 16
    use_hs: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(1, x.ndim - 1))
        y = jnp.mean(x, axis=axes)
        y = nn.Dense(self.channels // self.reduction, dtype=self.dtype,
                     param_dtype=jnp.float32, name='fc1')(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype,
                     param_dtype=jnp.float32, name='fc2')(y)
        y = hard_sigmoid(y) if self.use_hs else nn.sigmoid(y)
        y = y.reshape(y.shape[:1] + (1,) * (x.ndim - 2) + y.shape[-1:])
        return x * y


class ConvKernelParam(nn.Module):
    """Declare a conv kernel parameter without running the convolution.

    Used by re-layout compute paths (e.g. the X3D space-to-depth stages)
    that consume a standard ``nn.Conv``'s kernel in a transformed form: the
    variable tree ('<name>/kernel', lecun-normal init, fp32) is identical
    to ``nn.Conv(name=<name>)``, so either path can initialize or load a
    checkpoint and the other can apply it.
    """
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param('kernel', nn.initializers.lecun_normal(),
                          tuple(self.shape), jnp.float32)


class BNStatsParam(nn.Module):
    """Declare BatchNorm params/stats without running normalization.

    Variable tree matches ``nn.BatchNorm(name=<name>)`` exactly (params
    scale/bias, batch_stats mean/var, same initializers), for paths that
    fold the eval-time affine into adjacent ops.
    """
    features: int

    @nn.compact
    def __call__(self):
        f = (self.features,)
        scale = self.param('scale', nn.initializers.ones, f, jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, f, jnp.float32)
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros(f, jnp.float32))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones(f, jnp.float32))
        return scale, bias, mean.value, var.value
