"""Device mesh + sharding specs (TP over heads/ffn, DP over batch).

The reference has no distributed runtime at all (SURVEY.md §2.9) — its only
multi-device machinery is accelerate layer placement. Here multi-chip
execution is first-class: one ``jax.sharding.Mesh`` with named axes
("data", "model"), NamedSharding specs per parameter, and XLA-emitted
collectives over ICI. Megatron-style layout:

* q/k/v/gate/up projections: shard the OUTPUT dim over "model"
  -> activations come out head-sharded, no collective needed
* o/down projections: shard the INPUT dim over "model"
  -> XLA inserts one reduce-scatter/all-reduce per block, riding ICI
* embeddings / norms: replicated (vocab sharding is a later optimization)
* batch dims of activations: sharded over "data"

Weights are stored (out, in); "shard output dim" = PartitionSpec("model",
None), "shard input dim" = PartitionSpec(None, "model"). QTensor weights
shard their codes/scales along the same logical dims.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig


def make_mesh(n_data: int = 1, n_model: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_model is None:
        n_model = len(devices) // n_data
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# Column-parallel (shard out dim) vs row-parallel (shard in dim) per slot.
_COL_SLOTS = ("q", "k", "v", "qkv", "gate", "up", "fc1")
_ROW_SLOTS = ("o", "down", "fc2")


def _linear_spec(slot: str) -> P:
    if slot in _COL_SLOTS:
        return P("model", None)
    if slot in _ROW_SLOTS:
        return P(None, "model")
    return P(None, None)


def _leaf_spec(path_keys, leaf, n_model: int = 0) -> P:
    """PartitionSpec for one param leaf based on its pytree path."""
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path_keys]
    names = [getattr(k, "name", None) for k in path_keys]  # struct fields
    # find the linear slot in the path (attn/mlp node -> slot name)
    for i, k in enumerate(keys):
        if k in ("attn", "mlp") and i + 1 < len(keys):
            slot = keys[i + 1]
            leafname = keys[-1] if keys[-1] is not None else names[-1]
            if slot in ("q_norm", "k_norm"):
                return P()
            spec = _linear_spec(slot)
            # packed QTensor leaves: codes/scales/zeros have blocked shapes
            # (N, G, g[/2]); shard N for col-parallel, the group dim G for
            # row-parallel (groups follow the contraction dim)
            if leafname in ("codes", "scales", "zeros"):
                nd = getattr(leaf, "ndim", 0)
                shape = getattr(leaf, "shape", ())
                if spec == P("model", None) and (not n_model or shape[0] % n_model == 0):
                    return P(*(["model"] + [None] * (nd - 1)))
                if (spec == P(None, "model") and nd >= 2
                        and (not n_model or shape[1] % n_model == 0)):
                    # row-parallel: shard the GROUP dim (follows contraction)
                    return P(*([None, "model"] + [None] * (nd - 2)))
                return P()
            if leafname == "scales_t":
                # (G, N) transposed strip: axes swapped vs scales
                shape = getattr(leaf, "shape", ())
                if (spec == P("model", None) and len(shape) == 2
                        and (not n_model or shape[1] % n_model == 0)):
                    return P(None, "model")
                if (spec == P(None, "model") and len(shape) == 2
                        and (not n_model or shape[0] % n_model == 0)):
                    return P("model", None)
                return P()
            if leafname == "bias":
                # bias follows the output dim: sharded for col-parallel
                return P("model") if spec == P("model", None) else P()
            if getattr(leaf, "ndim", 0) == 2:
                return spec
            return P()
    # embeddings, norms, lm_head
    if "lm_head" in keys:
        leafname = keys[-1]
        if leafname == "weight" and getattr(leaf, "ndim", 0) == 2:
            return P("model", None)  # vocab-sharded head
        return P()
    return P()


def param_spec_tree(params, cfg: ModelConfig, mesh: Mesh = None):
    """PartitionSpec pytree matching the params pytree. Leaves whose shape
    cannot divide the model axis (e.g. single-group packed QTensors) fall
    back to replication when ``mesh`` is given."""
    n_model = int(mesh.shape.get("model", 0)) if mesh is not None else 0
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: _leaf_spec(p, leaf, n_model), params)


def shard_params(params, cfg: ModelConfig, mesh: Mesh):
    """device_put every param with its NamedSharding."""
    specs = param_spec_tree(params, cfg, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch-dim sharding for token arrays: (batch, seq, ...)."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
