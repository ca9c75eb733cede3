"""MVFNet-R50 K400, 4x16 dense recipe — TPU-native config.

Inherits the 8x8 recipe; only the temporal sampling changes (4 frames at
stride 16), which propagates into MVF's n_segment and the pipelines.
Reference GFLOPs: 4x16 = 16.454 G (reference r50 config:1-4).
"""

import os

_base_ = './mvf_kinetics400_r50_8x8_dense.py'

clip_len = 4
frame_interval = 16

model = dict(module_cfg=dict(n_segment=clip_len))

# pipelines embed the sampling parameters, so they are redefined wholesale
# (lists replace under _base_ merging, matching mmcv semantics)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
_tail = [
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
train_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len,
         frame_interval=frame_interval, num_clips=1),
    dict(type='FrameSelector'),
    dict(type='RandomResizedCrop', input_size=224),
    dict(type='Flip', flip_ratio=0.5),
] + _tail
val_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len,
         frame_interval=frame_interval, num_clips=1),
    dict(type='FrameSelector'),
    dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
    dict(type='CenterCrop', crop_size=224),
    dict(type='Flip', flip_ratio=0),
] + _tail
test_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len,
         frame_interval=frame_interval, num_clips=10),
    dict(type='FrameSelector'),
    dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
    dict(type='ThreeCrop', crop_size=256),
    dict(type='Flip', flip_ratio=0),
] + _tail

data = dict(train=dict(pipeline=train_pipeline),
            val=dict(pipeline=val_pipeline),
            test=dict(pipeline=test_pipeline))

work_dir = './experiments/mvfnet/k400_r50_%dx%d_dense' % (clip_len,
                                                          frame_interval)
resume_file = os.path.join(work_dir, 'latest.msgpack')
resume_from = resume_file if os.path.exists(resume_file) else None
