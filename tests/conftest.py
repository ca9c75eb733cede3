"""Test config: run everything on CPU with 8 virtual devices so sharding
tests exercise a real (virtual) mesh without TPU hardware.

Note: this machine's sitecustomize registers an 'axon' TPU backend and
force-updates jax_platforms at interpreter start, so setting the env var is
not enough — the jax config must be reset before any backend initializes."""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
