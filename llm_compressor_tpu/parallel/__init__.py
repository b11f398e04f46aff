from .mesh import make_mesh, shard_params, data_sharding, param_spec_tree
from .tp import (
    tp_init_cache,
    tp_param_specs,
    tp_serve_fns,
    tp_shard_params,
    tp_supported,
)

__all__ = [
    "make_mesh", "shard_params", "data_sharding", "param_spec_tree",
    "tp_init_cache", "tp_param_specs", "tp_serve_fns", "tp_shard_params",
    "tp_supported",
]
