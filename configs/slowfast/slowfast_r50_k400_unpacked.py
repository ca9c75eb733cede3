"""SlowFast R50 K400 — v5e training-throughput variant (fast_pack=8).

Identical recipe and parameters to the base config; the fast pathway
runs in time-to-channel packed layout (``ops/tpack.py``), which is
bit-compatible with the standard path (same param tree, checkpoints
interchangeable, equivalence pinned by tests/test_fast_pack.py).

Motivation (docs/DESIGN.md "SlowFast fast-path T->C packing"): the fast
pathway is 88% of the train step at 1/8 of the FLOPs (Cin=8 starves the
MXU's 128-lane contraction); packing x8 measured 107.7 -> 76.8 ms
backbone fwd+bwd and 55.7 -> 73.0 train clips/s/chip e2e (+31%).

Reference recipe being accelerated:
``/root/reference/codes/models/backbones/resnet_i3d_slowfast.py:83-207``.
"""

_base_ = './slowfast_r50_k400.py'

model = dict(backbone=dict(fast_pack=8))
