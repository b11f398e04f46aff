"""Layer-scan unroll A/B on the flagship W4A8 decode path (real TPU).

Hypothesis: the decode step is ~150 latency-bound small ops (norms, rope,
reshape/quant glue) around 4 Pallas kernel calls per layer; matmuls+glue
measures 2.75 ms/step vs a ~1.2 ms weight-stream floor (bench_r3_mid.json).
Unrolling the layer scan gives XLA a 2-4x wider basic block to overlap
glue with the next layer's weight DMAs.

Method: one process, one model build; each unroll factor is its own
executable (static arg). Phase 1 compiles all variants (tunnel compiles
take minutes — never time inline). Phase 2 interleaves timed calls
round-robin so every variant sees the same chip tenancy (throughput swings
~3x across minutes — CLAUDE.md). Fresh token values per call (identical
dispatches are tunnel-cache served); device_get is the completion barrier.

Usage: python experiments/exp_scan_unroll.py [--batch 128] [--steps 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--prefill", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--unrolls", type=str, default="1,2,4")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _flagship_cfg
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.engine import decode_greedy_steps, init_cache
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config

    on_tpu = jax.default_backend() == "tpu"
    cfg = _flagship_cfg(tiny=not on_tpu)
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw", head_act="int8-g[-1]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = stack_model(fuse_model(params, cfg, qcfg))
    print("model built", flush=True)

    B, steps = args.batch, args.steps
    max_len = -(-(args.prefill + (args.rounds + 3) * steps + 2) // 128) * 128
    unrolls = [int(u) for u in args.unrolls.split(",")]

    rng = np.random.default_rng(0)
    variants = {}
    for u in unrolls:
        cache = init_cache(cfg.num_layers, B, max_len, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        cache = cache.replace(lengths=jnp.full((B,), args.prefill, jnp.int32))
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 1)).astype(np.int32))
        t0 = time.perf_counter()
        toks, cache = decode_greedy_steps(params, tok, cache, n=steps,
                                          cfg=cfg, qcfg=qcfg, unroll=u)
        jax.device_get(toks)
        # 2nd untimed run: first post-compile exec measured 3.3x steady state
        toks, cache = decode_greedy_steps(params, toks[:, -1:], cache, n=steps,
                                          cfg=cfg, qcfg=qcfg, unroll=u)
        jax.device_get(toks)
        print(f"compiled unroll={u} in {time.perf_counter()-t0:.0f}s", flush=True)
        variants[u] = dict(cache=cache, tok=toks[:, -1:], times=[])

    for r in range(args.rounds):
        for u in unrolls:
            v = variants[u]
            jax.device_get(v["tok"])          # queue drained, fresh values
            t0 = time.perf_counter()
            toks, v["cache"] = decode_greedy_steps(
                params, v["tok"], v["cache"], n=steps, cfg=cfg, qcfg=qcfg,
                unroll=u)
            jax.device_get(toks)
            dt = (time.perf_counter() - t0) / steps * 1e3
            v["tok"] = toks[:, -1:]
            v["times"].append(dt)
            print(f"round {r} unroll={u}: {dt:6.2f} ms/step", flush=True)

    out = {f"unroll{u}_ms": round(min(v["times"]), 3)
           for u, v in variants.items()}
    out["batch"] = B
    print(json.dumps(out))


if __name__ == "__main__":
    main()
