from .mesh import make_mesh, shard_params, data_sharding, param_spec_tree

__all__ = ["make_mesh", "shard_params", "data_sharding", "param_spec_tree"]
