"""mvfnet_tpu — TPU-native video recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of whwu95/MVFNet
(AAAI 2021): MVF video models, config-driven registries, a data pipeline,
a training engine with data-parallel pjit, and dense multi-crop testing.
"""

__version__ = '0.1.0'

from .config import Config, ConfigDict
from .registry import Registry, build_from_cfg

__all__ = ['Config', 'ConfigDict', 'Registry', 'build_from_cfg',
           '__version__']
