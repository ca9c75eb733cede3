"""Device mesh + sharding helpers — the framework's entire communication layer.

Replaces the reference's NCCL/process-group machinery
(``/root/reference/codes/core/dist_utils.py:70-143``,
``parallel/distributed.py``): one ``jax.sharding.Mesh`` over all chips, data
parallel along the ``'data'`` axis, parameters replicated. XLA emits the
gradient all-reduce inside the compiled train step (the reference's
``allreduce_grads``, ``dist_utils.py:15-49``, is a compiler concern here);
parameter broadcast is the replicated sharding itself.

Multi-host: ``init_distributed`` wires ``jax.distributed.initialize`` from
standard env vars; each host feeds its own input shard
(``make_global_batch``) and XLA lays the global array over ICI/DCN.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def init_distributed(launcher: Optional[str] = None,
                     coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (reference ``init_dist``,
    ``dist_utils.py:70-113``). No-op for single-process runs.

    launcher='env' reads COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID;
    launcher='slurm' lets jax.distributed auto-detect from SLURM_* vars;
    launcher=None auto-initializes only when env vars are present.
    """
    if jax.distributed.is_initialized():
        return  # already initialized (must not touch the backend before
        # jax.distributed.initialize — jax.process_count() would)
    if launcher == 'slurm' or (launcher is None and 'SLURM_PROCID' in os.environ
                               and 'SLURM_NTASKS' in os.environ
                               and int(os.environ['SLURM_NTASKS']) > 1):
        jax.distributed.initialize()
        return
    addr = coordinator_address or os.environ.get('COORDINATOR_ADDRESS')
    if launcher == 'env' or (launcher is None and addr):
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes
            or int(os.environ.get('NUM_PROCESSES', '1')),
            process_id=process_id
            or int(os.environ.get('PROCESS_ID', '0')))


def get_dist_info() -> Dict[str, int]:
    """rank/world_size in reference terms (``dist_utils.py:116-131``)."""
    return dict(rank=jax.process_index(), world_size=jax.process_count(),
                local_device_count=jax.local_device_count(),
                global_device_count=jax.device_count())


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all devices (the reference's only
    parallelism mode — DP over 8..16 GPUs)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host-local numpy batch as a global device array sharded on
    the batch axis. In multi-host runs each host holds its own shard and
    this assembles the global array from per-host local data."""
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_sharding(mesh))
