"""Round-4: A/B the HYBRID Pallas/XLA fresh attention in the real engine.

Runs the flagship W4A8 decode at b128 (bench methodology: chained
dispatches + same-run RTT subtraction) with the head ablated and with
head+attn ablated, so t_attn = full - noattn. Set LLMC_FUSED_ATTN=1 to
trace the hybrid path; unset for the all-XLA fresh path. Run both in
separate processes and compare t_attn.

Usage: [LLMC_FUSED_ATTN=1] python experiments/exp_attn_hybrid.py
"""

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

    from bench import _bench_decode, _rtt_ms
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(tiny=jax.default_backend() != "tpu")
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw", head_act="int8-g[-1]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = stack_model(fuse_model(params, cfg, qcfg))

    out = {"fused_attn": bool(os.environ.get("LLMC_FUSED_ATTN")),
           "rtt_ms": round(_rtt_ms(), 1)}
    for tag, ab in (("full", ("head",)), ("noattn", ("head", "attn"))):
        best = None
        for _ in range(2):
            _, _, ms = _bench_decode(params, cfg, qcfg=qcfg, ablate=ab)
            best = ms if best is None else min(best, ms)
        out[tag + "_ms"] = round(best, 3)
        print(f"{tag:8s} {best:6.3f} ms/step", flush=True)
    out["t_attn_ms"] = round(out["full_ms"] - out["noattn_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
