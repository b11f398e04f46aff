"""Tensor-parallel serving under shard_map — guaranteed collective placement.

GSPMD decides collective placement heuristically, and Pallas custom calls
are opaque to its sharding propagation — on a TP mesh it may all-gather
packed weights around a kernel. This module instead runs the serving step
inside ``jax.shard_map`` with EXPLICIT shardings (the reference has no
distributed runtime at all — SURVEY.md §2.9 — so this layer is pure
north-star addition, laid out Megatron-style):

* column-parallel q/k/v/gate/up/fc1: output dim sharded over "model" —
  activations leave head-sharded, no collective;
* row-parallel o/down/fc2: contraction dim sharded; the local matmul is a
  partial sum, psum'ed over "model" once per projection
  (models.layers.tp_trace drives this inside qlinear);
* per-token activation scales for row-parallel inputs use a pmax over the
  model axis, so quantized numerics are bit-identical to single-chip;
* KV cache sharded over the KV-head axis; batch over "data";
* lm_head vocab-sharded (logits returned sharded over "model").

Packed QTensor leaves shard their codes/scales along the same logical dims;
the kernels read dims from the *local* array shapes (kernels/*._dims), so
each device runs the Pallas kernel on its own shard — no gathers, by
construction.

Serving-fused qkv_cat/gateup params shard only in the per-shard
interleaved layout — build them with ``fuse_model(..., shards=n_model)``
and pass ``fused=True`` here.

ALiBi archs (BLOOM) shard too: slopes are a function of the GLOBAL head
index, so models.layers.alibi_bias slices the full slope table at
axis_index * local_heads inside the trace; the fused query_key_value
weight is stored per-head interleaved, so a contiguous column shard is a
head shard as-is. Not supported (falls back to the GSPMD path):
non-divisible head/ffn counts.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.generate import _forward_cached
from ..engine.kvcache import KVCache, init_cache
from ..models.config import ModelConfig
from ..models.layers import tp_trace
from ..qformats.config import QuantConfig

_COL_SLOTS = ("q", "k", "v", "gate", "up", "fc1")
_ROW_SLOTS = ("o", "down", "fc2")


def tp_supported(cfg: ModelConfig, n_model: int) -> bool:
    """ALiBi shards (slopes sliced by global head index inside the trace —
    models.layers.alibi_bias) and BLOOM's fused query_key_value is
    per-head-interleaved, so a contiguous output-dim shard IS a head shard
    (column-parallel as stored); only head/ffn divisibility is required."""
    return (cfg.num_heads % n_model == 0
            and cfg.num_kv_heads % n_model == 0
            and cfg.intermediate_size % n_model == 0)


def _qt_ok(leaf, axis: int, n: int) -> bool:
    return leaf.shape[axis] % n == 0


def _leaf_spec(path_keys, leaf, n_model: int, fused: bool = False) -> P:
    """shard_map PartitionSpec for one serving-param leaf (stacked layers:
    leading L axis stays unsharded). ``fused`` allows qkv_cat/gateup params
    (column-parallel) when they were built with fuse_model(shards=n_model)
    — the per-shard interleaved layout."""
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path_keys]
    names = [getattr(k, "name", None) for k in path_keys]
    stacked = "layers_stacked" in keys
    lead = [None] if stacked else []

    for i, k in enumerate(keys):
        if k in ("attn", "mlp") and i + 1 < len(keys):
            slot = keys[i + 1]
            leafname = keys[-1] if keys[-1] is not None else names[-1]
            if slot in ("qkv_cat", "gateup") and not fused:
                raise ValueError(
                    "serving-fused qkv_cat/gateup params require "
                    "fuse_model(shards=n_model) + fused=True (per-shard "
                    "interleaved layout); plain fused params cannot TP-shard")
            if slot in ("q_norm", "k_norm"):
                return P()
            # "qkv" (BLOOM fused query_key_value) stores rows per-head
            # interleaved (h0:[q|k|v], h1:[q|k|v], ...) — an equal
            # contiguous split over the output dim is exactly a head
            # split, so it column-shards without re-interleaving.
            col = slot in _COL_SLOTS or slot in ("qkv_cat", "gateup", "qkv")
            row = slot in _ROW_SLOTS
            if not (col or row):
                return P()
            nd = getattr(leaf, "ndim", 0) - len(lead)
            if leafname in ("codes", "scales", "zeros"):
                # blocked (N, G, g[/2]): col -> shard N, row -> shard G
                ax = len(lead) + (0 if col else 1)
                if not _qt_ok(leaf, ax, n_model):
                    raise ValueError(f"{slot} QTensor axis {ax} not divisible "
                                     f"by model={n_model}")
                spec = [None] * (nd)
                spec[0 if col else 1] = "model"
                return P(*(lead + spec))
            if leafname == "scales_t":
                # transposed (G, N) strip: col -> shard N (axis 1),
                # row -> shard G (axis 0)
                ax = len(lead) + (1 if col else 0)
                if not _qt_ok(leaf, ax, n_model):
                    raise ValueError(f"{slot} QTensor scales_t axis {ax} not "
                                     f"divisible by model={n_model}")
                spec = [None] * (nd)
                spec[1 if col else 0] = "model"
                return P(*(lead + spec))
            if leafname == "bias":
                return P(*(lead + ["model"])) if col else P()
            if nd == 2:
                return P(*(lead + (["model", None] if col else [None, "model"])))
            return P()
    if "lm_head" in keys:
        leafname = keys[-1] if keys[-1] is not None else names[-1]
        nd = getattr(leaf, "ndim", 0)
        if leafname == "scales_t":
            return P(None, "model")  # (G, N): vocab dim is axis 1
        if leafname in ("weight", "codes", "scales", "zeros", "bias"):
            return P(*(["model"] + [None] * (nd - 1)))  # vocab-sharded
    return P()


def tp_param_specs(params, n_model: int, fused: bool = False):
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: _leaf_spec(p, leaf, n_model, fused), params)


def tp_cache_specs(cache: KVCache):
    """KV-head axis over "model", batch over "data" — cache layout
    (L, B, KV, D, S), scales (L, B, KV, 1, S) (engine/kvcache.py)."""
    kv = P(None, "data", "model", None, None)
    sc = P(None, "data", "model", None, None)
    return KVCache(
        k=kv, v=kv,
        k_scale=sc if cache.k_scale is not None else None,
        v_scale=sc if cache.v_scale is not None else None,
        lengths=P("data"), quantized=cache.quantized)


def tp_init_cache(cfg: ModelConfig, mesh: Mesh, batch: int, max_len: int,
                  quantized: bool = True, dtype=jnp.bfloat16) -> KVCache:
    cache = init_cache(cfg.num_layers, batch, max_len, cfg.num_kv_heads,
                       cfg.head_dim, dtype=dtype, quantized=quantized)
    specs = tp_cache_specs(cache)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs)


def _unpair_odd_row_shards(params, n_model: int):
    """Convert pair-planes int4 QTensors in ROW-parallel slots (o/down/fc2
    — contraction dim sharded) back to "group halves" when the per-shard
    group count would be ODD: the pair layout interleaves two groups per
    byte column block, so a contiguous byte-axis slice at an odd group
    boundary splits pairs and the local shard is not a valid layout of its
    groups. Column-parallel slots shard N and keep their pair layout."""
    from ..qformats.qtensor import QTensor, to_group_halves

    def walk(node, slot=None):
        if isinstance(node, QTensor):
            if (slot in _ROW_SLOTS and node.pair_planes
                    and (node.scales.shape[-1] // max(n_model, 1)) % 2):
                return to_group_halves(node)
            return node
        if isinstance(node, dict):
            return {k: walk(v, k if k in _ROW_SLOTS else slot)
                    for k, v in node.items()}
        return node

    return walk(params)


def tp_shard_params(params, cfg: ModelConfig, mesh: Mesh,
                    fused: bool = False):
    """device_put serving params (stacked or per-layer) with TP shardings.
    ``fused=True`` declares fuse_model(shards=n_model) interleaved params."""
    n_model = int(mesh.shape["model"])
    params = _unpair_odd_row_shards(params, n_model)
    specs = tp_param_specs(params, n_model, fused)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def _local_cfg(cfg: ModelConfig, n_model: int) -> ModelConfig:
    return replace(cfg, num_heads=cfg.num_heads // n_model,
                   num_kv_heads=cfg.num_kv_heads // n_model)


def tp_serve_fns(params, cfg: ModelConfig, mesh: Mesh,
                 qcfg: Optional[QuantConfig] = None, fused: bool = False):
    """Build (prefill_fn, decode_fn) running inside shard_map.

    ``params`` is only used for spec structure (pass the sharded params to
    the returned functions). Logits come back replicated over "model" when
    the head is tied/replicated, or vocab-sharded when ``lm_head`` exists —
    either way the returned global array is (B, vocab).
    """
    n_model = int(mesh.shape["model"])
    if not tp_supported(cfg, n_model):
        raise ValueError(f"arch {cfg.arch} not TP-shardable over {n_model}")
    lcfg = _local_cfg(cfg, n_model)
    pspecs = tp_param_specs(params, n_model, fused)
    vocab_sharded = "lm_head" in params
    logits_spec = P("data", "model") if vocab_sharded else P("data", None)

    def _body(p, tokens, cache, start, head_last=False):
        with tp_trace("model", n_model):
            logits, cache = _forward_cached(p, lcfg, tokens, cache, start,
                                            qcfg, head_last=head_last)
        return logits, cache

    def _prefill_local(p, tokens, cache):
        logits, cache = _body(p, tokens, cache, jnp.int32(0), head_last=True)
        cache = cache.replace(
            lengths=jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32))
        return logits[:, -1, :], cache

    def _decode_local(p, token, cache):
        logits, cache = _body(p, token, cache, None)
        cache = cache.replace(lengths=cache.lengths + 1)
        return logits[:, -1, :], cache

    def _wrap(local_fn):
        jitted = None  # built on first call (needs the cache pytree structure)

        def fn(p, tokens, cache):
            nonlocal jitted
            if jitted is None:
                cspecs = tp_cache_specs(cache)
                sm = jax.shard_map(
                    local_fn, mesh=mesh,
                    in_specs=(pspecs, P("data", None), cspecs),
                    out_specs=(logits_spec, cspecs),
                    check_vma=False,
                )
                jitted = jax.jit(sm, donate_argnums=(2,))
            return jitted(p, tokens, cache)

        return fn

    return _wrap(_prefill_local), _wrap(_decode_local)


def tp_batch_cache_specs(cache: KVCache) -> KVCache:
    """Cache specs for TP continuous batching: KV heads over "model", the
    slot (batch) axis REPLICATED — slots are host-scheduled and ragged, so
    data-parallel serving runs one batcher per replica rather than
    sharding one batcher's slots."""
    kv = P(None, None, "model", None, None)
    return KVCache(
        k=kv, v=kv,
        k_scale=kv if cache.k_scale is not None else None,
        v_scale=kv if cache.v_scale is not None else None,
        lengths=P(), quantized=cache.quantized)


def tp_batch_fns(params, cfg: ModelConfig, mesh: Mesh,
                 qcfg: Optional[QuantConfig] = None, fused: bool = False):
    """(chunk_prefill_fn, decode_all_fn) for ContinuousBatcher under
    explicit shard_map TP — the two device programs of engine.batching
    with tensor-parallel weights/KV (engine/batching.py:62-80 semantics).

    chunk_prefill_fn(p, tokens, mini_cache, start, last_idx) -> (last, mini)
    decode_all_fn(p, tokens, cache, active) -> (logits, cache)
    """
    n_model = int(mesh.shape["model"])
    if not tp_supported(cfg, n_model):
        raise ValueError(f"arch {cfg.arch} not TP-shardable over {n_model}")
    lcfg = _local_cfg(cfg, n_model)
    pspecs = tp_param_specs(params, n_model, fused)
    vocab_sharded = "lm_head" in params
    logits_spec = P(None, "model") if vocab_sharded else P(None, None)

    def _chunk_local(p, tokens, mini, start, last_idx):
        with tp_trace("model", n_model):
            logits, mini = _forward_cached(p, lcfg, tokens, mini, start, qcfg)
        last = jax.lax.dynamic_index_in_dim(logits, last_idx, axis=1,
                                            keepdims=False)
        return last, mini

    def _decode_local(p, tokens, cache, active):
        with tp_trace("model", n_model):
            logits, cache = _forward_cached(p, lcfg, tokens, cache, None, qcfg)
        cache = cache.replace(lengths=cache.lengths + active.astype(jnp.int32))
        return logits[:, -1, :], cache

    def _wrap(local_fn, extra_specs, donate):
        jitted = None

        def fn(p, tokens, cache, *extra):
            nonlocal jitted
            if jitted is None:
                cspecs = tp_batch_cache_specs(cache)
                sm = jax.shard_map(
                    local_fn, mesh=mesh,
                    in_specs=(pspecs, P(None, None), cspecs) + extra_specs,
                    out_specs=(logits_spec, cspecs),
                    check_vma=False,
                )
                jitted = jax.jit(sm, donate_argnums=donate)
            return jitted(p, tokens, cache, *extra)

        return fn

    return (_wrap(_chunk_local, (P(), P()), (2,)),
            _wrap(_decode_local, (P(),), (2,)))
