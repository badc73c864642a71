from ast_tpu.parallel.mesh import make_mesh, shard_batch, replicate, param_spec
from ast_tpu.parallel.multihost import (
    init_distributed, host_info, shard_batches_for_host, fold_host_into_key,
)

__all__ = [
    "make_mesh", "shard_batch", "replicate", "param_spec",
    "init_distributed", "host_info", "shard_batches_for_host",
    "fold_host_into_key",
]
