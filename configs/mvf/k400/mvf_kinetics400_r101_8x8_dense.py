"""MVFNet-R101 K400, 8x8 dense recipe — TPU-native config.

Inherits the R50 8x8 recipe; only the backbone depth changes.
Reference GFLOPs/params: 8x8 = 62.726 G / 43.36 M (reference r101 config:2-4).
"""

import os

_base_ = './mvf_kinetics400_r50_8x8_dense.py'

model = dict(backbone=dict(depth=101,
                           pretrained='pretrained/resnet101.pth'))

work_dir = './experiments/mvfnet/k400_r101_8x8_dense'
resume_file = os.path.join(work_dir, 'latest.msgpack')
resume_from = resume_file if os.path.exists(resume_file) else None
