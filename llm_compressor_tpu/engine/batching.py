"""Continuous batching — slot-based serving loop.

The north-star serving engine: requests stream in, each is prefilled into a
free slot of a shared KV cache, and ONE jitted decode step advances every
active slot per iteration; finished slots are recycled immediately. Prompt
prefill runs on a single-slot cache (bucketed lengths to bound
recompilation) and its K/V window is copied into the shared cache.

All device work is two jitted programs (bucketed prefill, batched decode);
the scheduler is a thin host loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..qformats.config import QuantConfig
from .generate import _forward_cached, _sample
from .kvcache import KVCache, init_cache, write_slot


@dataclass
class Request:
    uid: int
    tokens: np.ndarray              # (T,) prompt
    max_new_tokens: int = 64
    temperature: float = 0.0
    top_k: Optional[int] = None
    eos_id: Optional[int] = None
    # runtime state
    generated: List[int] = field(default_factory=list)
    done: bool = False


def _bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 511) // 512) * 512


@partial(jax.jit, static_argnames=("cfg", "qcfg"))
def _prefill_one(params, tokens, cache1: KVCache, last_idx, *, cfg, qcfg):
    """Bucketed single-slot prefill; ``last_idx`` picks the real last token's
    logits (prompts are zero-padded to the bucket; the padding's K/V beyond
    last_idx is causally masked and overwritten as the slot decodes)."""
    logits, cache1 = _forward_cached(params, cfg, tokens, cache1, jnp.int32(0), qcfg)
    last = jax.lax.dynamic_index_in_dim(logits, last_idx, axis=1, keepdims=False)
    return last, cache1


@partial(jax.jit, static_argnames=("cfg", "qcfg"), donate_argnums=(2,))
def _decode_all(params, tokens, cache: KVCache, active, *, cfg, qcfg):
    """One decode step for every slot; inactive slots advance nowhere."""
    logits, cache = _forward_cached(params, cfg, tokens, cache, None, qcfg)
    cache = cache.replace(lengths=cache.lengths + active.astype(jnp.int32))
    return logits[:, -1, :], cache


class ContinuousBatcher:
    """Slot-based continuous batching over a shared (optionally int8) KV
    cache. Usage::

        eng = ContinuousBatcher(params, cfg, batch_slots=8, max_len=1024)
        eng.submit(prompt_tokens, max_new_tokens=64)
        results = eng.run()          # {uid: np.ndarray of generated ids}
    """

    def __init__(self, params, cfg: ModelConfig, batch_slots: int = 8,
                 max_len: int = 1024, qcfg: Optional[QuantConfig] = None,
                 quantized_kv: bool = False, seed: int = 0):
        self.params = params
        self.cfg = cfg
        self.qcfg = qcfg
        self.slots = batch_slots
        self.max_len = max_len
        self.quantized_kv = quantized_kv
        self.cache = init_cache(cfg.num_layers, batch_slots, max_len,
                                cfg.num_kv_heads, cfg.head_dim,
                                quantized=quantized_kv)
        self.slot_req: List[Optional[Request]] = [None] * batch_slots
        self.queue: List[Request] = []
        self.finished: Dict[int, np.ndarray] = {}
        self.next_token = np.zeros((batch_slots, 1), dtype=np.int32)
        self.key = jax.random.PRNGKey(seed)
        self._uid = 0

    # ------------------------------------------------------------------
    def submit(self, tokens: np.ndarray, **kw) -> int:
        self._uid += 1
        self.queue.append(Request(self._uid, np.asarray(tokens, np.int32).ravel(), **kw))
        return self._uid

    def _admit(self):
        for s in range(self.slots):
            if self.slot_req[s] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            T = len(req.tokens)
            bucket = min(_bucket(T), self.max_len)
            padded = np.zeros((1, bucket), np.int32)
            padded[0, :T] = req.tokens
            mini = init_cache(self.cfg.num_layers, 1, bucket,
                              self.cfg.num_kv_heads, self.cfg.head_dim,
                              quantized=self.quantized_kv)
            logits, mini = _prefill_one(self.params, jnp.asarray(padded), mini,
                                        jnp.int32(T - 1),
                                        cfg=self.cfg, qcfg=self.qcfg)
            # splice the mini cache into the shared one
            self.cache = write_slot(self.cache, s, mini.k[:, 0], mini.v[:, 0],
                                    self.cfg.num_layers)
            if self.quantized_kv:
                self.cache = self.cache.replace(
                    k_scale=jax.lax.dynamic_update_slice(
                        self.cache.k_scale, mini.k_scale[:, 0][:, None],
                        (0, s, 0, 0, 0)),
                    v_scale=jax.lax.dynamic_update_slice(
                        self.cache.v_scale, mini.v_scale[:, 0][:, None],
                        (0, s, 0, 0, 0)),
                )
            self.cache = self.cache.replace(lengths=self.cache.lengths.at[s].set(T))
            self.slot_req[s] = req
            self.next_token[s, 0] = self._pick(logits, req)

    def _pick(self, logits, req: Request) -> int:
        self.key, sub = jax.random.split(self.key)
        tok = int(np.asarray(_sample(logits, req.temperature, req.top_k, sub))[0])
        req.generated.append(tok)
        if (req.eos_id is not None and tok == req.eos_id) or \
                len(req.generated) >= req.max_new_tokens:
            req.done = True
        return tok

    def _retire(self, s: int):
        req = self.slot_req[s]
        self.finished[req.uid] = np.asarray(req.generated, np.int32)
        self.slot_req[s] = None

    # ------------------------------------------------------------------
    def step(self) -> bool:
        """Admit + one decode step. Returns False when all work is done."""
        for s in range(self.slots):
            r = self.slot_req[s]
            if r is not None and r.done:
                self._retire(s)
        self._admit()
        active_list = [r is not None and not r.done for r in self.slot_req]
        if not any(active_list) and not self.queue:
            return False
        active = jnp.asarray(active_list, dtype=jnp.bool_)
        logits, self.cache = _decode_all(
            self.params, jnp.asarray(self.next_token), self.cache, active,
            cfg=self.cfg, qcfg=self.qcfg)
        logits_np = np.asarray(logits)
        for s in range(self.slots):
            req = self.slot_req[s]
            if req is None or req.done:
                continue
            if len(req.generated) + len(req.tokens) >= self.max_len:
                req.done = True
                continue
            self.next_token[s, 0] = self._pick(logits_np[s : s + 1], req)
        return True

    def run(self) -> Dict[int, np.ndarray]:
        while self.step():
            pass
        for s in range(self.slots):
            if self.slot_req[s] is not None:
                self._retire(s)
        return self.finished
