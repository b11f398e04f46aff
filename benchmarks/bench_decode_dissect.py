"""Dissect decode-step time on the flagship model (real TPU).

One run, intra-run comparable numbers (chip tenancy swings ~3x across
minutes — CLAUDE.md):
  * int4 decode with the fused Pallas int8-KV attention
  * int4 decode with the XLA dequant-window attention (LLMC_NO_FUSED_ATTN)
  * bf16 decode (both attention modes)
  * HBM stream anchor

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

    res = {}

    def run(tag, p, q):
        tps, gbs = _bench_decode(p, cfg, qcfg=q, steps=args.steps,
                                 batch=args.batch, prefill_len=args.prefill)
        res[tag] = {"tok_s": round(tps, 1), "gbs": round(gbs, 1)}
        print(f"{tag}: {tps:,.1f} tok/s  ({gbs:.1f} GB/s-effective)",
              flush=True)

    os.environ.pop("LLMC_NO_FUSED_ATTN", None)
    run("int4_fused_attn", int4, qcfg)
    run("bf16_fused_attn", bf16, None)
    # the env flag changes TRACED structure — drop the jit caches so the
    # second pass retraces (persistent /tmp/jax_cache still serves repeats)
    os.environ["LLMC_NO_FUSED_ATTN"] = "1"
    jax.clear_caches()
    run("int4_xla_attn", int4, qcfg)
    run("bf16_xla_attn", bf16, None)
    os.environ.pop("LLMC_NO_FUSED_ATTN", None)
    res["stream_gbs"] = round(_stream_gbs(), 1)
    print(f"stream anchor: {res['stream_gbs']} GB/s", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
