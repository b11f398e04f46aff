"""KV cache — bf16 or int8-quantized (per token, per head), per-slot lengths.

Layout: (L, B, S_max, KV, D) — sequence in the middle so prefill writes are
one dynamic_update_slice per layer and per-slot decode writes are a scatter
over the batch dim. ``lengths`` is per slot (B,), which is what continuous
batching needs: every slot advances independently.

INT8 mode stores codes plus per-(token, head) scales — the "quantized
KV-cache" of the north star; scales are computed at append time (absmax
over the head dim).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class KVCache:
    k: jnp.ndarray                      # (L, B, S, KV, D) bf16 — or int8 codes
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]      # (L, B, S, KV) f32 when quantized
    v_scale: Optional[jnp.ndarray]
    lengths: jnp.ndarray                # (B,) int32 — tokens cached per slot
    quantized: bool = struct.field(pytree_node=False, default=False)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def init_cache(n_layers: int, batch: int, max_len: int, n_kv: int, head_dim: int,
               dtype=jnp.bfloat16, quantized: bool = False) -> KVCache:
    shape = (n_layers, batch, max_len, n_kv, head_dim)
    lengths = jnp.zeros((batch,), jnp.int32)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:4], jnp.float32),
            v_scale=jnp.zeros(shape[:4], jnp.float32),
            lengths=lengths,
            quantized=True,
        )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   k_scale=None, v_scale=None, lengths=lengths, quantized=False)


def _quant_i8(x):
    """(B, T, KV, D) -> int8 codes + per-(token, head) scales."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return codes.astype(jnp.int8), scale


def append_prefill(cache: KVCache, layer: int, k, v, start) -> KVCache:
    """Write k/v (B, T, KV, D) at the same scalar ``start`` for all slots."""
    if cache.quantized:
        kc, ks = _quant_i8(k)
        vc, vs = _quant_i8(v)
        return cache.replace(
            k=jax.lax.dynamic_update_slice(cache.k, kc[None], (layer, 0, start, 0, 0)),
            v=jax.lax.dynamic_update_slice(cache.v, vc[None], (layer, 0, start, 0, 0)),
            k_scale=jax.lax.dynamic_update_slice(cache.k_scale, ks[None], (layer, 0, start, 0)),
            v_scale=jax.lax.dynamic_update_slice(cache.v_scale, vs[None], (layer, 0, start, 0)),
        )
    return cache.replace(
        k=jax.lax.dynamic_update_slice(cache.k, k.astype(cache.k.dtype)[None],
                                       (layer, 0, start, 0, 0)),
        v=jax.lax.dynamic_update_slice(cache.v, v.astype(cache.v.dtype)[None],
                                       (layer, 0, start, 0, 0)),
    )


def append_decode(cache: KVCache, layer: int, k, v, positions) -> KVCache:
    """Write one token per slot: k/v (B, 1, KV, D) at per-slot ``positions``
    (B,) — a batch-dim scatter."""
    b_idx = jnp.arange(cache.batch)
    if cache.quantized:
        kc, ks = _quant_i8(k)
        vc, vs = _quant_i8(v)
        return cache.replace(
            k=cache.k.at[layer, b_idx, positions].set(kc[:, 0]),
            v=cache.v.at[layer, b_idx, positions].set(vc[:, 0]),
            k_scale=cache.k_scale.at[layer, b_idx, positions].set(ks[:, 0]),
            v_scale=cache.v_scale.at[layer, b_idx, positions].set(vs[:, 0]),
        )
    return cache.replace(
        k=cache.k.at[layer, b_idx, positions].set(k[:, 0].astype(cache.k.dtype)),
        v=cache.v.at[layer, b_idx, positions].set(v[:, 0].astype(cache.v.dtype)),
    )


def write_slot(cache: KVCache, slot, k_slot, v_slot, n_layers: int) -> KVCache:
    """Overwrite one slot's cache from per-layer K/V stacks
    (L, T, KV, D) starting at position 0 (continuous-batching prefill)."""
    if cache.quantized:
        kc, ks = _quant_i8(k_slot)
        vc, vs = _quant_i8(v_slot)
        return cache.replace(
            k=jax.lax.dynamic_update_slice(cache.k, kc[:, None], (0, slot, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(cache.v, vc[:, None], (0, slot, 0, 0, 0)),
            k_scale=jax.lax.dynamic_update_slice(cache.k_scale, ks[:, None], (0, slot, 0, 0)),
            v_scale=jax.lax.dynamic_update_slice(cache.v_scale, vs[:, None], (0, slot, 0, 0)),
        )
    return cache.replace(
        k=jax.lax.dynamic_update_slice(cache.k, k_slot[:, None].astype(cache.k.dtype),
                                       (0, slot, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(cache.v, v_slot[:, None].astype(cache.v.dtype),
                                       (0, slot, 0, 0, 0)),
    )


def read(cache: KVCache, layer: int, dtype=jnp.bfloat16):
    """Full-window (B, S, KV, D) dequantized K and V for one layer."""
    k = cache.k[layer]
    v = cache.v[layer]
    if cache.quantized:
        k = (k.astype(jnp.float32) * cache.k_scale[layer][..., None]).astype(dtype)
        v = (v.astype(jnp.float32) * cache.v_scale[layer][..., None]).astype(dtype)
    return k.astype(dtype), v.astype(dtype)
