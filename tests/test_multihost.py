"""Two-OS-process multi-host integration (CPU, 2x2 virtual devices):
jax.distributed bootstrap, global mesh, per-host shards, synced DP train
step, process_allgather collection. Runs tools/multihost_smoke.py."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))


def _free_port():
    with socket.socket() as s:
        s.bind(('', 0))
        return s.getsockname()[1]


def test_two_process_training():
    # subprocess.communicate(timeout=360) bounds the run; no plugin needed
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ('PYTHONPATH',)}
    env_base.update(JAX_PLATFORMS='cpu', PYTHONPATH=REPO,
                    COORDINATOR_ADDRESS=f'localhost:{port}',
                    NUM_PROCESSES='2',
                    XLA_FLAGS='--xla_force_host_platform_device_count=2')
    procs = []
    for pid in range(2):
        env = dict(env_base, PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, 'tools',
                                          'multihost_smoke.py')],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=360)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'p{pid}:\n{out[-2000:]}'
        assert 'MULTIHOST_SMOKE_PASS' in out, out[-2000:]
    # both ranks computed the identical (synchronized) loss
    import re
    losses = [re.search(r'loss=([\d.]+)', o).group(1) for o in outs]
    assert losses[0] == losses[1], losses
