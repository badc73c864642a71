from ast_tpu.parallel.mesh import make_mesh, shard_batch, replicate, param_spec
from ast_tpu.parallel.multihost import init_distributed, host_info, is_primary

__all__ = [
    "make_mesh", "shard_batch", "replicate", "param_spec",
    "init_distributed", "host_info", "is_primary",
]
