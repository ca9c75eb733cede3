from .builder import DATASETS, PIPELINES, RepeatDataset, build_dataset
from .pipeline import Compose
from . import sampling, transforms, loading, datasets  # noqa: F401 (registry)
from .loader import DataLoader, build_dataloader, default_collate
from .sampler import ShardedSampler

__all__ = ['DATASETS', 'PIPELINES', 'build_dataset', 'RepeatDataset',
           'Compose', 'DataLoader', 'build_dataloader', 'default_collate',
           'ShardedSampler']
