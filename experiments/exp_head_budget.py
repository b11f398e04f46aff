"""Where does t_head (1.43 ms/step at batch 128) go?

In-graph chained timings (fresh values, device_get barriers, interleaved):
  matmul      — packed int8-g128 head matmul alone (dequant kernel — the
                head op is weight-only quant, act_in dummy)
  matmul_amax — matmul + f32 cast + argmax (the serving head epilogue)
  amax_only   — argmax over a precomputed (B, V) f32 logits buffer
  w4a8        — same head through the int8-act kernel (different
                semantics — reference head quant is weight-only — shown
                for the speed ceiling of an integer head)
  bf16        — dense bf16 head matmul
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _flagship_cfg
    from llm_compressor_tpu.kernels.dequant_matmul import dequant_matmul
    from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
    from llm_compressor_tpu.qformats import Quantizer, ElemFormat, quantize_pack

    on_tpu = jax.default_backend() == "tpu"
    cfg = _flagship_cfg(tiny=not on_tpu)
    V, E, B, reps = cfg.vocab_size, cfg.hidden_size, 128, 24

    rng = np.random.default_rng(0)
    q = Quantizer(qtype="int", fmt=ElemFormat.int8, group_size=128)
    W = rng.normal(0, 0.02, size=(V, E)).astype(np.float32)
    qt = quantize_pack(q, jnp.asarray(W))
    wb = jnp.asarray(W).astype(jnp.bfloat16)
    logits0 = jnp.asarray(rng.normal(size=(B, V)).astype(np.float32))

    def chain_ids(h, ids):
        # feed the argmax back into the input so reps can't collapse
        return h + (ids[:, :1].astype(h.dtype) * 1e-6)

    def mk(body, *ws):
        # weights ride as jit ARGS — closed-over device arrays embed in the
        # tunnel compile payload (HTTP 413 >100MB, CLAUDE.md)
        @jax.jit
        def f(h0, *ws):
            def step(i, h):
                ids = body(h, *ws)
                return chain_ids(h, ids)
            return jax.lax.fori_loop(0, reps, step, h0)
        return lambda h0: f(h0, *ws)

    def m_matmul(h, qt):  # matmul only: argmax over a 256-wide slice
        y = dequant_matmul(h, qt)
        return jnp.argmax(y[:, :256], axis=-1).astype(jnp.int32)[:, None]

    def m_matmul_amax(h, qt):
        y = dequant_matmul(h, qt).astype(jnp.float32)
        return jnp.argmax(y, axis=-1).astype(jnp.int32)[:, None]

    def m_amax_only(h, logits0):
        l = logits0 + h[:, :1].astype(jnp.float32)
        return jnp.argmax(l, axis=-1).astype(jnp.int32)[:, None]

    def m_w4a8(h, qt):
        y = w4a8_matmul(h, qt).astype(jnp.float32)
        return jnp.argmax(y, axis=-1).astype(jnp.int32)[:, None]

    def m_bf16(h, wb):
        y = jax.lax.dot_general(h, wb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.argmax(y, axis=-1).astype(jnp.int32)[:, None]

    fns = {"matmul": mk(m_matmul, qt),
           "matmul_amax": mk(m_matmul_amax, qt),
           "amax_only": mk(m_amax_only, logits0),
           "w4a8": mk(m_w4a8, qt),
           "bf16": mk(m_bf16, wb)}

    def run(f):
        h = jnp.asarray(rng.normal(size=(B, E)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        jax.device_get(h[:1, :8])
        t0 = time.perf_counter()
        jax.device_get(f(h)[:1, :8])
        return (time.perf_counter() - t0) / reps * 1e3

    for f in fns.values():
        run(f); run(f)                       # compile + first-exec warm
    out = {}
    for _ in range(3):
        for k, f in fns.items():
            out.setdefault(k, []).append(round(run(f), 3))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
