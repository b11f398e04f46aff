"""Fused gateup+silu MLP kernel: on-chip A/B (VERDICT r4 items 1 and 5).

Decode (b128) and prefill (b8 x 512) with the fused kernel ON vs OFF, in
ONE process/run. The LLMC_NO_FUSED_MLP latch is a module global flipped
between sections; decode uses distinct no-op ablate tags for fresh jit
keys, prefill uses two separate jit wrappers over prefill.__wrapped__
(identical computation, independent caches).

At the flagship shape (C/g = 16) the fused kernel engages at ALL M since
its round-4 routing (`_try_fused_gateup`: the bail is m_rows > 256 AND
C/g > 16), so this measures both the decode win and the prefill routing.

Run: python experiments/exp_fused_mlp_ab.py
"""

import json
import os
import sys
import time
from functools import partial

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
    assert jax.default_backend() == "tpu"

    import bench
    from __graft_entry__ import _flagship_cfg
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.engine import init_cache
    from llm_compressor_tpu.engine.generate import prefill
    from llm_compressor_tpu.kernels import w4a8_matmul as wm
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config

    cfg = _flagship_cfg()
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw", head_act="int8-g[-1]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = fuse_model(params, cfg, qcfg)
    params = stack_model(params)

    out = {}

    # --- decode A/B ------------------------------------------------------
    for tag, off, abl in (("decode_fused", False, ("mlp_a",)),
                          ("decode_split", True, ("mlp_b",)),
                          ("decode_fused_2", False, ("mlp_c",))):
        wm._NO_FUSED_MLP = off
        _, _, ms = bench._bench_decode(params, cfg, qcfg=qcfg, ablate=abl)
        out[tag + "_ms"] = round(ms, 3)
        print(tag, round(ms, 3), "ms/step", flush=True)

    # --- prefill A/B -----------------------------------------------------
    batch, plen, reps = 8, 512, 5
    rng = np.random.default_rng(7)
    max_len = 640

    def fresh_cache():
        return init_cache(cfg.num_layers, batch, max_len,
                          cfg.num_kv_heads, cfg.head_dim, quantized=True)

    for tag, off in (("prefill_fused", False), ("prefill_split", True),
                     ("prefill_fused_2", False)):
        wm._NO_FUSED_MLP = off
        fn = jax.jit(prefill.__wrapped__, static_argnames=("cfg", "qcfg"),
                     donate_argnums=(2,))
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                        (batch, plen)).astype(np.int32))
        logits, _ = fn(params, toks, fresh_cache(), cfg=cfg, qcfg=qcfg)
        jax.device_get(logits[:1, :8])
        times = []
        for i in range(reps):
            t2 = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                          (batch, plen)).astype(np.int32))
            c2 = fresh_cache()
            jax.device_get(c2.k[:1, :1, :1, :1, :8])
            jax.device_get(t2[:1, :8])
            t0 = time.perf_counter()
            logits, c2 = fn(params, t2, c2, cfg=cfg, qcfg=qcfg)
            jax.device_get(logits[:1, :8])
            times.append((time.perf_counter() - t0) * 1e3)
        out[tag + "_ms"] = round(float(np.percentile(times, 50)), 1)
        print(tag, out[tag + "_ms"], "ms p50", flush=True)

    out["rtt_ms"] = round(bench._rtt_ms(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
