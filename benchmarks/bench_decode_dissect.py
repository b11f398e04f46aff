"""Dissect decode-step time on the flagship model (real TPU).

One run, intra-run comparable numbers (chip tenancy swings ~3x across
minutes — CLAUDE.md):
  * int4 decode (fresh-block scan path, int8-codes XLA attention)
  * bf16 decode (carried-cache path)
  * HBM stream anchor
(The Pallas decode-attention kernel was removed from the serving path after
losing its A/B twice — benchmarks/bench_attention_variants.py has the
isolated attention comparison incl. the archived kernel.)

Usage: python benchmarks/bench_decode_dissect.py [--steps 32] [--batch 32]
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
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prefill", type=int, default=128)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import _bench_decode, _stream_gbs
    from __graft_entry__ import _flagship_cfg
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config

    on_tpu = jax.default_backend() == "tpu"
    cfg = _flagship_cfg(tiny=not on_tpu)
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    bf16 = stack_model(fuse_model(
        jax.tree_util.tree_map(lambda x: x, params), cfg, None))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    int4 = stack_model(fuse_model(params, cfg, qcfg))

    # Phase 1: compile every variant (tunnel compiles take minutes, during
    # which chip tenancy drifts — measuring inline would skew the A/B).
    # Phase 2: interleave timed calls A,B,C,D x rounds so every variant sees
    # the same chip conditions; report per-round numbers and best-of.
    import jax.numpy as jnp

    from llm_compressor_tpu.engine import decode_greedy_steps, init_cache

    def build(tag, p, q):
        max_len = -(-(args.prefill + args.steps + 2) // 128) * 128
        cache = init_cache(cfg.num_layers, args.batch, max_len,
                           cfg.num_kv_heads, cfg.head_dim, quantized=True)
        cache = cache.replace(lengths=jnp.full((args.batch,), args.prefill,
                                               jnp.int32))
        rng = np.random.default_rng(abs(hash(tag)) % 2**31)
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                       (args.batch, 1)).astype(np.int32))
        toks, cache = decode_greedy_steps(p, tok, cache, n=args.steps,
                                          cfg=cfg, qcfg=q)
        jax.device_get(toks)
        print(f"compiled {tag}", flush=True)
        return dict(tag=tag, p=p, q=q, cache=cache, tok=toks[:, -1:])

    variants = [
        build("int4", int4, qcfg),
        build("bf16", bf16, None),
    ]

    res = {v["tag"]: [] for v in variants}
    for rnd in range(3):
        for v in variants:
            t0 = time.perf_counter()
            toks, v["cache"] = decode_greedy_steps(
                v["p"], v["tok"], v["cache"], n=args.steps, cfg=cfg,
                qcfg=v["q"])
            jax.device_get(toks)   # real completion barrier (CLAUDE.md)
            dt = time.perf_counter() - t0
            v["tok"] = toks[:, -1:]
            res[v["tag"]].append(round(args.batch * args.steps / dt, 1))
        print(f"round {rnd}: "
              + "  ".join(f"{v['tag']}={res[v['tag']][-1]:,.0f}"
                          for v in variants), flush=True)
    res["stream_gbs"] = round(_stream_gbs(), 1)
    print(f"stream anchor: {res['stream_gbs']} GB/s", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
