"""Classic TSN with BNInception backbone (the reference's default 2-D combo,
recognizer2d.py:12-13)."""
import os

num_segments = 3
model = dict(
    type='Recognizer2D',
    backbone=dict(type='BNInception', bn_eval=False),
    cls_head=dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                  dropout_ratio=0.8, in_channels=1024, init_std=0.001,
                  num_classes=400),
)
test_cfg = dict(average_clips='prob')
root = os.environ.get('MVF_DATA_ROOT', '/data/')
img_norm_cfg = dict(mean=[104, 117, 128], std=[1, 1, 1], to_rgb=False,
                    device=True)
train_pipeline = [
    dict(type='SampleFrames', clip_len=1, frame_interval=1,
         num_clips=num_segments),
    dict(type='FrameSelector'),
    dict(type='MultiScaleCrop', input_size=224,
         scales=[1, .875, .75, .66], max_distort=1),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
test_pipeline = [
    dict(type='SampleFrames', clip_len=1, frame_interval=1, num_clips=25),
    dict(type='FrameSelector'),
    dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
    dict(type='TenCrop', crop_size=224),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
data = dict(
    videos_per_gpu=32, workers_per_gpu=4,
    train=dict(type='RawFramesDataset',
               ann_file='datalist/kinetics400/train_ffmpeg_fps30.txt',
               data_root=root + 'k400_train_rgb_ffmpeg_fps30',
               pipeline=train_pipeline, test_mode=False, modality='RGB',
               filename_tmpl='img_{:05}.jpg'),
    test=dict(type='RawFramesDataset',
              ann_file='datalist/kinetics400/val_ffmpeg_fps30.txt',
              data_root=root + 'k400_val_rgb_ffmpeg_fps30',
              pipeline=test_pipeline, test_mode=True, modality='RGB',
              filename_tmpl='img_{:05}.jpg'))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=1e-4,
                 nesterov=True)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='step', step=[60, 90])
checkpoint_config = dict(interval=10)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
total_epochs = 100
log_level = 'INFO'
work_dir = './experiments/tsn/k400_bninception'
load_from = None
resume_from = None
eval_interval = 10
