from ast_tpu.parallel.mesh import make_mesh, shard_batch, replicate, param_spec

__all__ = ["make_mesh", "shard_batch", "replicate", "param_spec"]
