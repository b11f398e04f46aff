"""Speculative decoding A/B on the real TPU (VERDICT r2 item 6).

Measures, on the flagship W4A8 serving config (packed int4 weights, int8
KV, stacked layers):

  scan     — decode_greedy_steps, N tokens in N/32 one-scan dispatches
             (the serving fast path; per-dispatch tunnel RTT amortized)
  spec     — generate_speculative (prompt-lookup drafts, one T=K+1 verify
             dispatch + one device_get per step, accept computed in-graph)

on two prompts: a CYCLIC one (the n-gram proposer's best case — the random
-init flagship tends to loop on it) and a RANDOM one (worst case, accept ~0).
Reports committed tokens/sec for each plus the measured mean-accepted and
the break-even acceptance implied by the verify/scan step-time ratio:

    spec emits (a+1) tokens per verify dispatch; scan emits 1 per step but
    pays no RTT. break_even_a = t_verify_dispatch / t_scan_step - 1.

All timing per CLAUDE.md tunnel rules: fresh input values per timed call,
device_get barriers, intra-run ratios only.
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--new", type=int, default=128, help="tokens to generate")
    ap.add_argument("--k-draft", type=int, default=7)
    ap.add_argument("--prompt-len", type=int, default=64)
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
    from llm_compressor_tpu.engine import decode_greedy_steps, init_cache, prefill
    from llm_compressor_tpu.engine.speculative import generate_speculative
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config

    on_tpu = jax.default_backend() == "tpu"
    cfg = _flagship_cfg(tiny=not on_tpu)
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = stack_model(fuse_model(params, cfg, qcfg))

    B, T, N, K = args.batch, args.prompt_len, args.new, args.k_draft
    rng = np.random.default_rng(0)
    cyc = np.tile(rng.integers(0, cfg.vocab_size, (B, 8)), (1, T // 8)
                  ).astype(np.int32)
    rnd = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)

    def run_spec(prompt):
        t0 = time.perf_counter()
        hist, acc = generate_speculative(
            params, cfg, prompt, max_new_tokens=N, k_draft=K, qcfg=qcfg,
            quantized_kv=True)
        dt = time.perf_counter() - t0
        toks = sum(len(h) - prompt.shape[1] for h in hist)
        return toks / dt, acc

    def run_scan(prompt):
        max_len = -(-(T + N + 1) // 128) * 128
        cache = init_cache(cfg.num_layers, B, max_len, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        logits, cache = prefill(params, jnp.asarray(prompt), cache,
                                cfg=cfg, qcfg=qcfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        t0 = time.perf_counter()
        done = 0
        while done < N:
            n = min(32, N - done)
            toks, cache = decode_greedy_steps(params, tok, cache, n=n,
                                              cfg=cfg, qcfg=qcfg)
            tok = toks[:, -1:]
            done += n
        jax.device_get(tok)
        return B * N / (time.perf_counter() - t0)

    # compile warmup (untimed): one full pass of each on its prompt shape
    run_spec(cyc)
    run_scan(cyc)

    out = {}
    for tag, prompt in (("cyclic", cyc), ("random", rnd)):
        # fresh values each timed call (tunnel-cache rules)
        p2 = (prompt + 1 + rng.integers(0, 7)) % cfg.vocab_size
        p2 = p2.astype(np.int32)
        if tag == "cyclic":  # keep it cyclic after perturbation
            p2 = np.tile(p2[:, :8], (1, T // 8))
        tps_spec, acc = run_spec(p2)
        tps_scan = run_scan(((p2 + 3) % cfg.vocab_size).astype(np.int32))
        out[f"spec_tps_{tag}"] = round(tps_spec, 1)
        out[f"scan_tps_{tag}"] = round(tps_scan, 1)
        out[f"mean_accept_{tag}"] = round(acc, 2)
        out[f"spec_vs_scan_{tag}"] = round(tps_spec / tps_scan, 3)

    # Genuinely-repetitive workload: a random-init flagship with 128k
    # vocab essentially never emits a repeated n-gram (mean accept ~0
    # above — drafts can't help ANY drafting scheme there). A small-vocab
    # random-init model falls into greedy cycles within a few tokens —
    # the honest stand-in for the repetitive/structured text (code edits,
    # extraction, quoted chat) prompt-lookup is built for.
    import dataclasses

    svcfg = dataclasses.replace(cfg, vocab_size=512)
    svparams = init_params(svcfg, jax.random.PRNGKey(3))
    rtn(svparams, svcfg, qcfg)
    pack_model(svparams, svcfg, qcfg)
    svparams = stack_model(fuse_model(svparams, svcfg, qcfg))

    def run_spec_sv(prompt):
        t0 = time.perf_counter()
        hist, acc = generate_speculative(
            svparams, svcfg, prompt, max_new_tokens=N, k_draft=K,
            qcfg=qcfg, quantized_kv=True)
        dt = time.perf_counter() - t0
        toks = sum(len(h) - prompt.shape[1] for h in hist)
        return toks / dt, acc

    def run_scan_sv(prompt):
        max_len = -(-(T + N + 1) // 128) * 128
        cache = init_cache(svcfg.num_layers, B, max_len, svcfg.num_kv_heads,
                           svcfg.head_dim, quantized=True)
        logits, cache = prefill(svparams, jnp.asarray(prompt), cache,
                                cfg=svcfg, qcfg=qcfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        t0 = time.perf_counter()
        done = 0
        while done < N:
            n = min(32, N - done)
            toks, cache = decode_greedy_steps(svparams, tok, cache, n=n,
                                              cfg=svcfg, qcfg=qcfg)
            tok = toks[:, -1:]
            done += n
        jax.device_get(tok)
        return B * N / (time.perf_counter() - t0)

    svp = rng.integers(0, svcfg.vocab_size, (B, T)).astype(np.int32)
    run_spec_sv(svp)   # compile warmup
    run_scan_sv(svp)
    svp2 = ((svp + 5) % svcfg.vocab_size).astype(np.int32)
    tps_spec, acc = run_spec_sv(svp2)
    tps_scan = run_scan_sv(((svp2 + 3) % svcfg.vocab_size).astype(np.int32))
    out["spec_tps_loopy"] = round(tps_spec, 1)
    out["scan_tps_loopy"] = round(tps_scan, 1)
    out["mean_accept_loopy"] = round(acc, 2)
    out["spec_vs_scan_loopy"] = round(tps_spec / tps_scan, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
