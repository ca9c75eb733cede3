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


@pytest.mark.parametrize('nproc,devs_per_proc', [(2, 2), (4, 1)],
                         ids=['2proc_x2dev', '4proc_x1dev'])
def test_multi_process_training(nproc, devs_per_proc, tmp_path):
    # subprocess.communicate(timeout=900) bounds the run; no plugin
    # needed (4 procs x 1 core: compiles serialize, so the bound is wide)
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ('PYTHONPATH',)}
    env_base.update(
        JAX_PLATFORMS='cpu', PYTHONPATH=REPO,
        COORDINATOR_ADDRESS=f'localhost:{port}',
        NUM_PROCESSES=str(nproc),
        MULTIHOST_CKPT_DIR=str(tmp_path),
        XLA_FLAGS=f'--xla_force_host_platform_device_count={devs_per_proc}')
    procs = []
    for pid in range(nproc):
        env = dict(env_base, PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, 'tools',
                                          'multihost_smoke.py')],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'p{pid}:\n{out[-2000:]}'
        assert 'MULTIHOST_SMOKE_PASS' in out, out[-2000:]
        assert 'ckpt cycle OK' in out, out[-2000:]
    # every rank computed the identical (synchronized) losses, both for
    # the live run and for the post-restore step
    import re
    for pat in (r'steps done, loss=([\d.]+)',
                r'post-restore loss=([\d.]+)'):
        losses = {re.search(pat, o).group(1) for o in outs}
        assert len(losses) == 1, (pat, losses)
