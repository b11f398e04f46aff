"""Round-5 fused-append kernel: cold-executable check + context scaling.

1. cold-exec: a never-compiled steps count (47) vs the disk-cached 32 —
   if the freshly-compiled executable times ~2x slower DESPITE the two
   untimed warmup execs in _bench_decode, the round-5 first A/B's 9.8
   ms/step was a cold-executable artifact (CLAUDE.md documents 3.3x
   first-exec effects; this probes whether it outlives two warmups).
2. scaling: append kernel vs XLA two-part at max_len 256 / 512 / 1024 —
   the kernel streams the main window at ~600 GB/s vs XLA's ~300, so its
   edge should grow with context length.

Run: python experiments/exp_append_scaling.py
"""

import importlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    assert jax.default_backend() == "tpu"

    import bench
    from __graft_entry__ import _flagship_cfg
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config

    gen = importlib.import_module("llm_compressor_tpu.engine.generate")

    cfg = _flagship_cfg()
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw", head_act="int8-g[-1]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = fuse_model(params, cfg, qcfg)
    params = stack_model(params)

    out = {}

    # --- 1. cold-exec probe (append mode) --------------------------------
    gen._ATTN_APPEND_OPTIN = True
    tps, _, ms = bench._bench_decode(params, cfg, qcfg=qcfg, steps=47,
                                     ablate=("noopc",))
    out["append_cold_steps47_ms"] = round(ms, 3)
    print("append cold-compile steps=47:", round(ms, 3), "ms/step", flush=True)
    tps, _, ms = bench._bench_decode(params, cfg, qcfg=qcfg, steps=32,
                                     ablate=("noop",))
    out["append_warm_steps32_ms"] = round(ms, 3)
    print("append disk-warm steps=32:", round(ms, 3), "ms/step", flush=True)

    # --- 2. context scaling ---------------------------------------------
    # prefill_len sets the filled window; max_len rounds up to 128s.
    for pf in (128, 384, 896):
        for tag, optin in (("append", True), ("xla", False)):
            gen._ATTN_APPEND_OPTIN = optin
            _, gbs, ms = bench._bench_decode(
                params, cfg, qcfg=qcfg, prefill_len=pf,
                ablate=(f"noop_{tag}_{pf}",))
            out[f"{tag}_pf{pf}_ms"] = round(ms, 3)
            out[f"{tag}_pf{pf}_gbs"] = round(gbs, 1)
            print(f"{tag} prefill_len={pf}: {ms:.3f} ms/step "
                  f"({gbs:.0f} GB/s)", flush=True)
    out["rtt_ms"] = round(bench._rtt_ms(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
