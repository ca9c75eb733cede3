from .optim import build_lr_schedule, build_optimizer, sgd_torch
from .train_step import TrainState, make_eval_step, make_train_step
from .train_loop import (CheckpointHook, EvalHook, Hook, TextLoggerHook,
                         TrainLoop, train_network)
from .eval import evaluate_dataset
from .prefetch import prefetch_to_device

__all__ = ['build_lr_schedule', 'build_optimizer', 'sgd_torch', 'TrainState',
           'make_train_step', 'make_eval_step', 'TrainLoop', 'train_network',
           'Hook', 'TextLoggerHook', 'CheckpointHook', 'EvalHook',
           'evaluate_dataset', 'prefetch_to_device']
