"""SlowFast R50 K400 — unpacked escape hatch (fast_pack=0).

The base config ships the tuned execution form (``fast_pack=8`` packed
fast pathway + ``stem_s2d='train'`` stems). This variant restores the
literal unpacked graph — numerically identical, same param tree and
checkpoints, just slower (55.7 vs 105.2 train clips/s/chip,
docs/DESIGN.md) — for debugging layout-sensitive issues or comparing
against the straightforward formulation.

Reference recipe being mirrored:
``/root/reference/codes/models/backbones/resnet_i3d_slowfast.py:83-207``.
"""

_base_ = './slowfast_r50_k400.py'

model = dict(backbone=dict(fast_pack=0, stem_s2d=False))
