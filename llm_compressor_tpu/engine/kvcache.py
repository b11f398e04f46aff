"""KV cache — bf16 or int8-quantized (per token, per head).

Layout: (L, B, S_max, KV, D) — sequence in the middle so decode writes are
a single dynamic_update_slice per layer and attention reads are contiguous.
INT8 mode stores codes plus per-(token, head) scales — the "quantized
KV-cache" of the north star; scales are computed on the fly at append time
(absmax over the head dim, the qmatmul axes=-2 convention for V and the
matching per-head convention for K).
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
    length: jnp.ndarray                 # () int32 — tokens currently cached
    quantized: bool = struct.field(pytree_node=False, default=False)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_cache(n_layers: int, batch: int, max_len: int, n_kv: int, head_dim: int,
               dtype=jnp.bfloat16, quantized: bool = False) -> KVCache:
    shape = (n_layers, batch, max_len, n_kv, head_dim)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:4], jnp.float32),
            v_scale=jnp.zeros(shape[:4], jnp.float32),
            length=jnp.int32(0),
            quantized=True,
        )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   k_scale=None, v_scale=None, length=jnp.int32(0), quantized=False)


def _quant_i8(x):
    """(B, T, KV, D) -> int8 codes + per-(token, head) scales."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return codes.astype(jnp.int8), scale


def append(cache: KVCache, layer: int, k: jnp.ndarray, v: jnp.ndarray,
           start: jnp.ndarray) -> KVCache:
    """Write k/v (B, T, KV, D) at position ``start`` for one layer."""
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


def read(cache: KVCache, layer: int, dtype=jnp.bfloat16):
    """Full-window (B, S, KV, D) dequantized K and V for one layer."""
    k = cache.k[layer]
    v = cache.v[layer]
    if cache.quantized:
        k = (k.astype(jnp.float32) * cache.k_scale[layer][..., None]).astype(dtype)
        v = (v.astype(jnp.float32) * cache.v_scale[layer][..., None]).astype(dtype)
    return k.astype(dtype), v.astype(dtype)
