"""Direct cost of merge_fresh (the once-per-decode-call scatter) and the
append-ablation attribution under the round-5 kernel path.

The full-bench budget read t_append = 0.96 ms/step — 3.7x the round-4
value. Candidates: the merge scatter (4096-index XLA scatter, once per
32-step call), or ablation-diff contamination. This times merge_fresh in
isolation (chained, fresh values per rep) and re-runs the two ablation
points back-to-back.

Run: python experiments/exp_merge_cost.py
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
    assert jax.default_backend() == "tpu"

    import bench
    from __graft_entry__ import _flagship_cfg
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.engine.kvcache import (
        init_cache,
        init_fresh,
        merge_fresh,
    )
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config

    cfg = _flagship_cfg()
    out = {}

    # --- merge_fresh in isolation ---------------------------------------
    L, B, KV, D = cfg.num_layers, 128, cfg.num_kv_heads, cfg.head_dim
    S, n = 256, 32
    rng = np.random.default_rng(0)

    @jax.jit
    def run_merge(cache, fresh, len0, reps=8):
        def body(i, c):
            c2 = merge_fresh(c, fresh, len0, n)
            # chain through a value dep; keep lengths fixed so windows stay
            return c2.replace(lengths=len0,
                              k=c2.k + (i % 2).astype(jnp.int8))
        return jax.lax.fori_loop(0, reps, body, cache)

    cache = init_cache(L, B, S, KV, D, quantized=True)
    fresh = init_fresh(L, B, n, KV, D, quantized=True)
    fresh = fresh.replace(
        k=jnp.asarray(rng.integers(-127, 128, fresh.k.shape), jnp.int8),
        v=jnp.asarray(rng.integers(-127, 128, fresh.v.shape), jnp.int8))
    len0 = jnp.full((B,), 128, jnp.int32)
    c = run_merge(cache, fresh, len0)
    jax.device_get(c.k[:1, :1, :1, :1, :8])
    t0 = time.perf_counter()
    c = run_merge(c, fresh, len0)
    jax.device_get(c.k[:1, :1, :1, :1, :8])
    dt = (time.perf_counter() - t0) * 1e3 - bench._rtt_ms()
    out["merge_ms_per_call"] = round(dt / 8, 2)
    print(f"merge_fresh: {dt/8:.2f} ms/call "
          f"({dt/8/n*1e3:.0f} us/step amortized at n={n})", flush=True)

    # --- ablation attribution re-run ------------------------------------
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw", head_act="int8-g[-1]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = fuse_model(params, cfg, qcfg)
    params = stack_model(params)
    for tag, abl in (("noattn", ("head", "attn")),
                     ("noappend", ("head", "attn", "append")),
                     ("noattn_2", ("head", "attn", "mg2"))):
        _, _, ms = bench._bench_decode(params, cfg, qcfg=qcfg, ablate=abl,
                                      chain=4)
        out[tag + "_ms"] = round(ms, 3)
        print(tag, round(ms, 3), "ms/step", flush=True)
    out["rtt_ms"] = round(bench._rtt_ms(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
