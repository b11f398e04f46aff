"""KV cache — bf16 or int8-quantized (per token, per head), per-slot lengths.

Layout: (L, B, KV, D, S) with the SEQUENCE ON THE LANE DIM and head_dim on
sublanes. This is the attention-native layout on TPU:

* QK^T is q (r, D) . K (D, S) and probs.V is p (r, S) . V(D, S)^T — both
  direct MXU contractions with zero transposes (the serving int8-codes
  attention in engine/generate.py runs them straight off this layout).
* the per-(slot, head) window is contiguous in HBM — one dense DMA
  streams each head's codes.

Writes: prefill is one dynamic_update_slice per layer (new tokens land on a
lane-dim slice); decode is a per-slot scatter at each slot's own position.
``lengths`` is per slot (B,), which is what continuous batching needs:
every slot advances independently.

INT8 mode stores codes plus per-(token, head) scales (L, B, KV, 1, S) —
the "quantized KV-cache" of the north star; scales are computed at append
time (absmax over the head dim). The singleton axis makes the per-head
scale row a (1, S) tile (Pallas block shapes must keep the last two dims
full or hardware-aligned).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class KVCache:
    k: jnp.ndarray                      # (L, B, KV, D, S) bf16 — or int8 codes
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]      # (L, B, KV, 1, S) f32 when quantized
    v_scale: Optional[jnp.ndarray]
    lengths: jnp.ndarray                # (B,) int32 — tokens cached per slot
    quantized: bool = struct.field(pytree_node=False, default=False)

    @property
    def max_len(self) -> int:
        return self.k.shape[4]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def init_cache(n_layers: int, batch: int, max_len: int, n_kv: int, head_dim: int,
               dtype=jnp.bfloat16, quantized: bool = False) -> KVCache:
    shape = (n_layers, batch, n_kv, head_dim, max_len)
    scale_shape = (n_layers, batch, n_kv, 1, max_len)
    lengths = jnp.zeros((batch,), jnp.int32)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(scale_shape, jnp.float32),
            v_scale=jnp.zeros(scale_shape, jnp.float32),
            lengths=lengths,
            quantized=True,
        )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   k_scale=None, v_scale=None, lengths=lengths, quantized=False)


def _to_cache_layout(x):
    """Projection output (B, T, KV, D) -> cache layout (B, KV, D, T)."""
    return jnp.transpose(x, (0, 2, 3, 1))


def _quant_i8(x):
    """(B, T, KV, D) -> int8 codes (B, KV, D, T) + scales (B, KV, T)."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1)                    # (B, T, KV)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    codes = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127)
    return (_to_cache_layout(codes).astype(jnp.int8),
            jnp.transpose(scale, (0, 2, 1))[:, :, None])       # (B, KV, 1, T)


def append_prefill(cache: KVCache, layer: int, k, v, start) -> KVCache:
    """Write k/v (B, T, KV, D) at the same scalar ``start`` for all slots."""
    if cache.quantized:
        kc, ks = _quant_i8(k)
        vc, vs = _quant_i8(v)
        return cache.replace(
            k=jax.lax.dynamic_update_slice(cache.k, kc[None], (layer, 0, 0, 0, start)),
            v=jax.lax.dynamic_update_slice(cache.v, vc[None], (layer, 0, 0, 0, start)),
            k_scale=jax.lax.dynamic_update_slice(cache.k_scale, ks[None], (layer, 0, 0, 0, start)),
            v_scale=jax.lax.dynamic_update_slice(cache.v_scale, vs[None], (layer, 0, 0, 0, start)),
        )
    return cache.replace(
        k=jax.lax.dynamic_update_slice(
            cache.k, _to_cache_layout(k).astype(cache.k.dtype)[None],
            (layer, 0, 0, 0, start)),
        v=jax.lax.dynamic_update_slice(
            cache.v, _to_cache_layout(v).astype(cache.v.dtype)[None],
            (layer, 0, 0, 0, start)),
    )


def append_decode(cache: KVCache, layer: int, k, v, positions) -> KVCache:
    """Write T tokens per slot: k/v (B, T, KV, D) at per-slot ``positions``
    — (B,) for single-token decode or (B, T) for speculative verify steps —
    a batch-dim scatter onto the lane (sequence) axis."""
    T = k.shape[1]
    if positions.ndim == 1:
        positions = positions[:, None]                  # (B, 1)
    b_idx = jnp.arange(cache.batch)[:, None]            # broadcasts vs (B, T)
    if cache.quantized:
        kc, ks = _quant_i8(k)        # (B, KV, D, T), (B, KV, 1, T)
        vc, vs = _quant_i8(v)
        # index arrays (B, T) on dims (batch, lane) -> writes (B, T, KV, D)
        km = jnp.moveaxis(kc, -1, 1)                    # (B, T, KV, D)
        vm = jnp.moveaxis(vc, -1, 1)
        ksm = jnp.moveaxis(ks, -1, 1)                   # (B, T, KV, 1)
        vsm = jnp.moveaxis(vs, -1, 1)
        return cache.replace(
            k=cache.k.at[layer, b_idx, :, :, positions].set(km),
            v=cache.v.at[layer, b_idx, :, :, positions].set(vm),
            k_scale=cache.k_scale.at[layer, b_idx, :, :, positions].set(ksm),
            v_scale=cache.v_scale.at[layer, b_idx, :, :, positions].set(vsm),
        )
    return cache.replace(
        k=cache.k.at[layer, b_idx, :, :, positions].set(
            k.astype(cache.k.dtype)),
        v=cache.v.at[layer, b_idx, :, :, positions].set(
            v.astype(cache.v.dtype)),
    )


# ---------------------------------------------------------------------------
# Fresh-block decode (scan fast path)
#
# Scattering each decode step's K/V into the big carried cache and then
# reading that cache in the same scan body forces XLA to copy-protect the
# buffers: the round-3 time budget measured the write+read interaction at
# ~7 ms of a 14 ms step at batch 128 while the attention reads alone run at
# the DMA floor (experiments/exp_decode_budget.py, BENCH history). The scan
# fast path therefore keeps the big cache READ-ONLY and accumulates the new
# tokens in this small per-call "fresh" block, written at the (uniform)
# scan-step lane index — an in-place dynamic_update_slice, no scatter — and
# merged into the main cache ONCE after the scan (amortized over n steps).
# ---------------------------------------------------------------------------


@struct.dataclass
class FreshKV:
    """Per-decode-call K/V accumulator. Codes (L, B, KV, W, D) with the
    scan step on the SUBLANE dim and head_dim on lanes — the per-step
    write is then a (B, KV, 1, D) sublane-slab dynamic_update_slice
    (lane-dim-full), not a 1-lane column write (the round-4 layout; its
    write was the obstruction to every fused-kernel arrangement —
    docs/serving.md round-4 attention table, VERDICT r4 item 3). Scales
    stay (L, B, KV, 1, W) — step on lanes — because the epilogue
    broadcasts them across r rows exactly like the main cache scales.
    int8 codes + per-(token, head) scales when quantized (the same
    `_quant_i8` computation as a per-step append would store — codes
    bitwise equal; the f32 scales agree to rounding-order ulps, see
    generate.py's fresh-block notes)."""
    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]

    @property
    def window(self) -> int:
        return self.k.shape[3]


def init_fresh(n_layers: int, batch: int, window: int, n_kv: int,
               head_dim: int, quantized: bool, dtype=jnp.bfloat16) -> FreshKV:
    shape = (n_layers, batch, n_kv, window, head_dim)
    sshape = (n_layers, batch, n_kv, 1, window)
    if quantized:
        return FreshKV(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(sshape, jnp.float32),
                       v_scale=jnp.zeros(sshape, jnp.float32))
    return FreshKV(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   k_scale=None, v_scale=None)


def write_fresh(fresh: FreshKV, layer, t, kc, vc, ks=None, vs=None) -> FreshKV:
    """Write one step's already-laid-out K/V — codes-or-values (B, KV, D, 1)
    (+ scales (B, KV, 1, 1)) — at (layer, sublane-row t for codes, lane t
    for scales): uniform dynamic_update_slices, in-place under the scan
    (no scatter). The (B, KV, D, 1) -> (B, KV, 1, D) move is a free
    reshape (a size-1 dim swap), and the codes write is a full-lane
    sublane slab."""
    B, KVh, D, _ = kc.shape
    row = lambda c: c.reshape(B, KVh, 1, D)
    new = fresh.replace(
        k=jax.lax.dynamic_update_slice(
            fresh.k, row(kc)[None].astype(fresh.k.dtype), (layer, 0, 0, t, 0)),
        v=jax.lax.dynamic_update_slice(
            fresh.v, row(vc)[None].astype(fresh.v.dtype), (layer, 0, 0, t, 0)),
    )
    if fresh.k_scale is not None:
        new = new.replace(
            k_scale=jax.lax.dynamic_update_slice(
                fresh.k_scale, ks[None], (layer, 0, 0, 0, t)),
            v_scale=jax.lax.dynamic_update_slice(
                fresh.v_scale, vs[None], (layer, 0, 0, 0, t)),
        )
    return new


def merge_fresh(cache: KVCache, fresh: FreshKV, lengths0, n: int) -> KVCache:
    """Scatter the first ``n`` fresh steps into the main cache at per-slot
    positions lengths0 + [0, n) and advance lengths — ONE scatter per
    decode_greedy_steps call instead of one per step.

    Uniform-length fast path (round 5): when every slot has the same
    length — the common case after batch prefill — the general
    4096-index XLA scatter (measured 4.4 ms/call at the bench shape,
    experiments/exp_merge_cost.py) collapses to ONE dynamic_update_slice
    per buffer at a shared lane offset. lax.cond selects per call; both
    branches write identical values."""
    B = cache.batch
    b_idx = jnp.arange(B)[:, None]                     # (B, 1)
    pos = lengths0[:, None] + jnp.arange(n)[None, :]   # (B, n)

    def scatter_codes(buf, src):  # (L,B,KV,W,D) -> update (B,n,L,KV,D)
        upd = jnp.transpose(src[:, :, :, :n, :], (1, 3, 0, 2, 4))
        return buf.at[:, b_idx, :, :, pos].set(upd.astype(buf.dtype))

    def scatter_scales(buf, src):  # (L,B,KV,1,W) -> update (B,n,L,KV,1)
        upd = jnp.transpose(src[..., :n], (1, 4, 0, 2, 3))
        return buf.at[:, b_idx, :, :, pos].set(upd.astype(buf.dtype))

    def dus_codes(buf, src):      # lane-window DUS at the shared offset
        upd = jnp.transpose(src[:, :, :, :n, :], (0, 1, 2, 4, 3))
        start = (0, 0, 0, 0, lengths0[0])
        return jax.lax.dynamic_update_slice(buf, upd.astype(buf.dtype),
                                            start)

    def dus_scales(buf, src):
        start = (0, 0, 0, 0, lengths0[0])
        return jax.lax.dynamic_update_slice(
            buf, src[..., :n].astype(buf.dtype), start)

    uniform = jnp.all(lengths0 == lengths0[0])
    bufs = [(cache.k, fresh.k, True), (cache.v, fresh.v, True)]
    if cache.quantized:
        bufs += [(cache.k_scale, fresh.k_scale, False),
                 (cache.v_scale, fresh.v_scale, False)]
    outs = []
    for buf, src, is_codes in bufs:
        outs.append(jax.lax.cond(
            uniform,
            (dus_codes if is_codes else dus_scales),
            (scatter_codes if is_codes else scatter_scales),
            buf, src))
    cache = cache.replace(k=outs[0], v=outs[1], lengths=lengths0 + n)
    if cache.quantized:
        cache = cache.replace(k_scale=outs[2], v_scale=outs[3])
    return cache


def write_slot(cache: KVCache, slot, k_slot, v_slot, n_layers: int) -> KVCache:
    """Splice one slot's K/V from a single-slot cache's arrays (L, KV, D, T)
    — already in cache layout, codes-or-values matching the target dtype
    (continuous-batching prefill; the caller copies scales alongside)."""
    return cache.replace(
        k=jax.lax.dynamic_update_slice(
            cache.k, k_slot[:, None].astype(cache.k.dtype), (0, slot, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(
            cache.v, v_slot[:, None].astype(cache.v.dtype), (0, slot, 0, 0, 0)),
    )


def read(cache: KVCache, layer: int, dtype=jnp.bfloat16):
    """Full-window (B, KV, D, S) dequantized K and V for one layer (the XLA
    reference path; the Pallas kernel reads codes directly instead)."""
    k = cache.k[layer]
    v = cache.v[layer]
    if cache.quantized:
        k = (k.astype(jnp.float32) * cache.k_scale[layer]).astype(dtype)
        v = (v.astype(jnp.float32) * cache.v_scale[layer]).astype(dtype)
    return k.astype(dtype), v.astype(dtype)
