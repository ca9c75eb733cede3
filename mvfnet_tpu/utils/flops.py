"""FLOPs / params reporting.

Replaces the reference's module-hook profiler
(``/root/reference/codes/utils/flops_hook.py`` + ``misc.py:8-39``) with XLA's
own cost analysis: the compiled HLO is the ground truth for what the chip
executes, no per-op counting rules needed. Reported FLOPs use the
multiply-add == 2 FLOPs convention; the reference counts MACs (GFLOPs column
in its configs), so ``macs = flops / 2`` is also returned for comparison.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def params_count(params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def xla_cost_analysis(fn, *args) -> Dict[str, float]:
    compiled = jax.jit(fn).lower(*args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0]
    return dict(costs)


def get_flop_stats(model, variables, input_shape: Tuple[int, ...]
                   ) -> Dict[str, Any]:
    """FLOPs for one forward pass at ``input_shape`` (B, S, H, W, C)."""
    imgs = jnp.zeros(input_shape, jnp.float32)

    def fwd(v, x):
        return model.apply(v, x, None, return_loss=False)

    costs = xla_cost_analysis(fwd, variables, imgs)
    flops = float(costs.get('flops', 0.0))
    return {
        'flops': flops,
        'macs': flops / 2.0,
        'gmacs': flops / 2.0e9,
        'params': params_count(variables['params']),
        'bytes_accessed': float(costs.get('bytes accessed', 0.0)),
    }
