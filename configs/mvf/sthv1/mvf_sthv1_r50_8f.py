"""MVFNet-R50 Something-Something V1 (8 frames, TSN-style segment sampling;
sth dense test uses the 2x offset variant via sth_samples=2)."""
import os

clip_len = 1
num_segments = 8

model = dict(
    type='Recognizer2D',
    backbone=dict(type='ResNet', pretrained='pretrained/resnet50.pth',
                  depth=50, out_indices=(3,), norm_eval=False,
                  norm_cfg=dict(type='BN', requires_grad=True)),
    cls_head=dict(type='TSNClsHead', spatial_size=-1, spatial_type='avg',
                  dropout_ratio=0.5, in_channels=2048, init_std=0.001,
                  num_classes=174),
    module_cfg=dict(type='MVF', n_segment=num_segments, alpha=0.125,
                    mvf_freq=(0, 0, 1, 1), mode='THW'),
)
test_cfg = dict(average_clips='prob')
compute_dtype = 'bfloat16'
root = os.environ.get('MVF_DATA_ROOT', '/data/')
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True, device=True)
train_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len, frame_interval=1,
         num_clips=num_segments),
    dict(type='FrameSelector'),
    dict(type='MultiScaleCrop', input_size=224,
         scales=[1, .875, .75, .66], max_distort=1),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
test_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len, frame_interval=1,
         num_clips=num_segments, sth_samples=2),
    dict(type='FrameSelector'),
    dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
    dict(type='CenterCrop', crop_size=224),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
data = dict(
    videos_per_gpu=12, workers_per_gpu=4,
    train=dict(type='RawFramesDataset',
               ann_file='datalist/sthv1/train_rgb.txt',
               data_root=root + 'sthv1_rgb', pipeline=train_pipeline,
               test_mode=False, modality='RGB',
               filename_tmpl='{:05}.jpg'),
    test=dict(type='RawFramesDataset',
              ann_file='datalist/sthv1/val_rgb.txt',
              data_root=root + 'sthv1_rgb', pipeline=test_pipeline,
              test_mode=True, modality='RGB', filename_tmpl='{:05}.jpg'))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=5e-4,
                 nesterov=True)
optimizer_config = dict(grad_clip=dict(max_norm=20, norm_type=2))
lr_config = dict(policy='step', step=[30, 45], warmup='linear',
                 warmup_ratio=0.01, warmup_iters=500)
checkpoint_config = dict(interval=5)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
total_epochs = 50
log_level = 'INFO'
work_dir = './experiments/mvfnet/sthv1_r50_8f'
load_from = None
resume_from = None
eval_interval = 5
