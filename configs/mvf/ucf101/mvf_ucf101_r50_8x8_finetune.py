"""MVFNet-R50 UCF101 finetune from ImageNet pretrain (BASELINE config #3).
Same model as the K400 recipe; shorter schedule, split-1 annotation lists
from data_process/gen_label.py."""

import os

clip_len = 8
frame_interval = 8

model = dict(
    type='Recognizer2D',
    backbone=dict(type='ResNet', pretrained='pretrained/resnet50.pth',
                  depth=50, out_indices=(3,), norm_eval=False,
                  partial_norm=False,
                  norm_cfg=dict(type='BN', requires_grad=True)),
    cls_head=dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                  with_avg_pool=False, temporal_feature_size=1,
                  spatial_feature_size=1, dropout_ratio=0.8,
                  in_channels=2048, init_std=0.001, num_classes=101),
    module_cfg=dict(type='MVF', n_segment=clip_len, alpha=0.125,
                    mvf_freq=(0, 0, 1, 1), mode='THW'),
)
train_cfg = None
test_cfg = dict(average_clips='prob')
compute_dtype = 'bfloat16'

root = os.environ.get('MVF_DATA_ROOT', '/data/')
dataset_type = 'RawFramesDataset'
data_root = root + 'ucf101_rgb'
ann_file_train = 'datalist/ucf101/train_rgb_split_1.txt'
ann_file_val = 'datalist/ucf101/val_rgb_split_1.txt'

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True, device=True)

train_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len,
         frame_interval=frame_interval, num_clips=1),
    dict(type='FrameSelector'),
    dict(type='RandomResizedCrop', input_size=224),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
val_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len,
         frame_interval=frame_interval, num_clips=1),
    dict(type='FrameSelector'),
    dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
    dict(type='CenterCrop', crop_size=224),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
test_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len,
         frame_interval=frame_interval, num_clips=10),
    dict(type='FrameSelector'),
    dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
    dict(type='ThreeCrop', crop_size=256),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
data = dict(
    videos_per_gpu=12, workers_per_gpu=4,
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_root=data_root, pipeline=train_pipeline,
               test_mode=False, modality='RGB',
               filename_tmpl='img_{:05}.jpg'),
    val=dict(type=dataset_type, ann_file=ann_file_val, data_root=data_root,
             pipeline=val_pipeline, test_mode=True, modality='RGB',
             filename_tmpl='img_{:05}.jpg'),
    test=dict(type=dataset_type, ann_file=ann_file_val, data_root=data_root,
              pipeline=test_pipeline, test_mode=True, modality='RGB',
              filename_tmpl='img_{:05}.jpg'))

optimizer = dict(type='SGD', lr=0.005, momentum=0.9, weight_decay=1e-4,
                 nesterov=True)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='step', step=[20, 40], warmup='linear',
                 warmup_ratio=0.01, warmup_iters=500)
checkpoint_config = dict(interval=5)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
total_epochs = 50
log_level = 'INFO'
work_dir = './experiments/mvfnet/ucf101_r50_%dx%d' % (clip_len,
                                                      frame_interval)
load_from = None
resume_file = os.path.join(work_dir, 'latest.msgpack')
resume_from = resume_file if os.path.exists(resume_file) else None
eval_interval = 5
