"""Decode-step time budget on the real TPU (VERDICT round-2 item #1).

Measures the flagship int4 decode with CUMULATIVE component ablations so the
differences attribute step time:

    full                      = everything
    -head                     = full minus the lm_head (+ logits + argmax)
    -head-attn                = ... minus the attention core (QK/softmax/PV)
    -head-attn-append         = ... minus the KV-cache scatter
                              = weight matmuls + norms/rope/embed glue

All variants run as ONE n-step lax.scan per timed call (fresh token values
per call; device_get completion barriers; interleaved rounds so every
variant sees the same chip tenancy — CLAUDE.md timing rules).

Usage: python experiments/exp_decode_budget.py [--steps 32] [--batch 128]
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--prefill", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from bench import _stream_gbs
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.engine import decode_greedy_steps, init_cache
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config

    on_tpu = jax.default_backend() == "tpu"
    cfg = _flagship_cfg(tiny=not on_tpu)
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    int4 = stack_model(fuse_model(params, cfg, qcfg))

    # "full" engages the fresh-block path automatically (the default);
    # ablations run on the same path, attributing its step time.
    variants = [
        ("full", (), False),
        ("nohead", ("head",), False),
        ("nohead_noattn", ("head", "attn"), False),
        ("nohead_noattn_noappend", ("head", "attn", "append"), False),
    ]

    def build(tag, ablate, fused):
        max_len = -(-(args.prefill + args.steps * (args.rounds + 1) + 2)
                    // 128) * 128
        cache = init_cache(cfg.num_layers, args.batch, max_len,
                           cfg.num_kv_heads, cfg.head_dim, quantized=True)
        cache = cache.replace(lengths=jnp.full((args.batch,), args.prefill,
                                               jnp.int32))
        rng = np.random.default_rng(abs(hash(tag)) % 2**31)
        tok = jnp.asarray(rng.integers(0, cfg.hidden_size,
                                       (args.batch, 1)).astype(np.int32))
        t0 = time.perf_counter()
        toks, cache = decode_greedy_steps(int4, tok, cache, n=args.steps,
                                          cfg=cfg, qcfg=qcfg, ablate=ablate,
                                          fused_attn=fused)
        jax.device_get(toks)
        print(f"compiled {tag} in {time.perf_counter()-t0:.0f}s", flush=True)
        return dict(tag=tag, ablate=ablate, fused=fused, cache=cache,
                    tok=toks[:, -1:])

    built = [build(t, a, f) for t, a, f in variants]

    res = {v["tag"]: [] for v in built}
    for rnd in range(args.rounds):
        for v in built:
            t0 = time.perf_counter()
            toks, v["cache"] = decode_greedy_steps(
                int4, v["tok"], v["cache"], n=args.steps, cfg=cfg, qcfg=qcfg,
                ablate=v["ablate"], fused_attn=v["fused"])
            jax.device_get(toks)
            dt = time.perf_counter() - t0
            v["tok"] = toks[:, -1:]
            res[v["tag"]].append(round(dt / args.steps * 1e3, 3))  # ms/step
        print(f"round {rnd}: "
              + "  ".join(f"{v['tag']}={res[v['tag']][-1]:.2f}ms"
                          for v in built), flush=True)

    best = {t: min(r) for t, r in res.items()}
    budget = {
        "t_step_ms": best["full"],
        "t_head_ms": round(best["full"] - best["nohead"], 3),
        "t_attn_ms": round(best["nohead"] - best["nohead_noattn"], 3),
        "t_append_ms": round(best["nohead_noattn"]
                             - best["nohead_noattn_noappend"], 3),
        "t_matmul_glue_ms": best["nohead_noattn_noappend"],
    }
    res["budget"] = budget
    res["stream_gbs"] = round(_stream_gbs(), 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
