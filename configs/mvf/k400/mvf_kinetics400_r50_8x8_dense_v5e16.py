"""MVFNet-R50 K400 8x8 dense — v5e batch-16 throughput variant.

Same recipe as the base 8x8 config with the per-chip batch raised from 12
to 16 and the LR linearly rescaled (the reference's --autoscale-lr rule,
``codes/core/train.py`` lr * total_batch / (8 gpus x 12)). Motivation: the
measured v5e per-chip batch sweep (docs/MIGRATION.md / DESIGN.md) has its
throughput knee at 16 — a folded 128-frame batch, the power of two XLA
tiles onto the MXU best — worth +4.5% train clips/s over batch 12.

Reference recipe being scaled:
``/root/reference/configs/MVFNet/K400/mvf_kinetics400_2d_rgb_r50_dense.py:122,152``.
"""

_base_ = './mvf_kinetics400_r50_8x8_dense.py'

data = dict(videos_per_gpu=16)

# 0.015 * 16/12 = 0.02 at the same 8-chip mesh (linear scaling rule)
optimizer = dict(lr=0.02)
