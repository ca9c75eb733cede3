from .mesh import (DATA_AXIS, batch_sharding, get_dist_info, init_distributed,
                   make_mesh, replicate, replicated_sharding, shard_batch)

__all__ = ['DATA_AXIS', 'make_mesh', 'batch_sharding', 'replicated_sharding',
           'shard_batch', 'replicate', 'init_distributed', 'get_dist_info']
