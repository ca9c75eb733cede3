"""MVFNet-R50 K400, 8x8 dense recipe — TPU-native config.

Carries the reference recipe's hyperparameters
(``/root/reference/configs/MVFNet/K400/mvf_kinetics400_2d_rgb_r50_dense.py``)
on this framework's TPU-native execution model: NHWC data layout end to
end, bf16 compute with fp32 params, and global-batch semantics (per-host
batch = videos_per_gpu x local chips on the data-parallel mesh).
Reference GFLOPs/params: 8x8 = 32.909 G / 24.34 M.

The 4x16 / 16x4 / R101 / video-decode variants in this directory inherit
from this file via ``_base_``.
"""

import os

clip_len = 8
frame_interval = 8

# -- schedule: SGD 0.015 nesterov, step [90, 130] of 150 epochs, linear
#    warmup, global-grad-norm clip at 40 (reference :152-160)
optimizer = dict(type='SGD', lr=0.015, momentum=0.9, weight_decay=0.0001,
                 nesterov=True)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='step', step=[90, 130], warmup_ratio=0.01,
                 warmup='linear', warmup_iters=25070)
total_epochs = 150

# -- model: R50 trunk, MVF wrapping conv1 of every res4/res5 block
#    (alpha 0.125, THW views), TSN consensus head over 400 classes
model = dict(
    type='Recognizer2D',
    backbone=dict(
        type='ResNet',
        pretrained='pretrained/resnet50.pth',
        depth=50,
        out_indices=(3,),
        norm_eval=False,
        partial_norm=False,
        norm_cfg=dict(type='BN', requires_grad=True),
    ),
    module_cfg=dict(
        type='MVF',
        n_segment=clip_len,
        alpha=0.125,
        mvf_freq=(0, 0, 1, 1),
        mode='THW'),
    cls_head=dict(
        type='TSNClsHead',
        spatial_size=-1,
        spatial_type='avg',
        with_avg_pool=False,
        temporal_feature_size=1,
        spatial_feature_size=1,
        dropout_ratio=0.5,
        in_channels=2048,
        init_std=0.01,
        num_classes=400),
)
train_cfg = None
test_cfg = dict(average_clips='prob')
compute_dtype = 'bfloat16'   # params stay fp32; bf16 on the MXU

# -- data: rawframe JPEGs, reference aug recipe, NHWC formatting
root = os.environ.get('MVF_DATA_ROOT', '/data/')
dataset_type = 'RawFramesDataset'
data_root = root + 'k400_train_rgb_ffmpeg_fps30'
data_root_val = root + 'k400_val_rgb_ffmpeg_fps30'
ann_file_train = 'datalist/kinetics400/train_ffmpeg_fps30.txt'
ann_file_val = 'datalist/kinetics400/val_ffmpeg_fps30.txt'
ann_file_test = 'datalist/kinetics400/val_ffmpeg_fps30.txt'

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

data = dict(
    videos_per_gpu=12,   # per-chip batch; global = 12 x mesh size
    workers_per_gpu=4,
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_root=data_root, pipeline=train_pipeline,
               test_mode=False, modality='RGB',
               filename_tmpl='img_{:05}.jpg'),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_root=data_root_val, pipeline=val_pipeline,
             test_mode=True, modality='RGB',
             filename_tmpl='img_{:05}.jpg'),
    test=dict(type=dataset_type, ann_file=ann_file_test,
              data_root=data_root_val, pipeline=test_pipeline,
              test_mode=True, modality='RGB',
              filename_tmpl='img_{:05}.jpg'))

# -- runtime
checkpoint_config = dict(interval=10)
workflow = [('train', 1)]
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
log_level = 'INFO'
eval_interval = 10
work_dir = './experiments/mvfnet/k400_r50_%dx%d_dense' % (clip_len,
                                                          frame_interval)
load_from = None
resume_file = os.path.join(work_dir, 'latest.msgpack')
resume_from = resume_file if os.path.exists(resume_file) else None
