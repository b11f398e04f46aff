"""On-chip A/B: round-5 fused-append attention kernel vs the XLA two-part
fresh path, in-engine, same process/run (RTT-corrected chained timing via
bench.py's _bench_decode).

The LLMC_ATTN_APPEND latch is a module global read at trace time; the two
sections use distinct ablate tags ("noop" is not a recognized ablation —
identical graph, distinct jit key) so the flipped global genuinely
retraces instead of hitting the cached executable.

Run: python experiments/exp_attn_append.py
"""

import importlib
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    assert jax.default_backend() == "tpu", "A/B only means anything on-chip"

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
    for tag, optin, ablate in (("xla_two_part", False, ()),
                               ("append_kernel", True, ("noop",)),
                               # repeat A to bound drift within the run
                               ("xla_two_part_2", False, ("noop2",)),
                               # attention-ablated under each mode: the
                               # diff vs the full path attributes t_attn
                               ("append_noattn", True, ("attn", "noop3")),
                               ("xla_noattn", False, ("attn", "noop4"))):
        gen._ATTN_APPEND_OPTIN = optin
        tps, gbs, ms = bench._bench_decode(params, cfg, qcfg=qcfg,
                                           ablate=ablate)
        out[tag] = {"tok_s": round(tps, 1), "gbs": round(gbs, 1),
                    "ms_step": round(ms, 3)}
        print(tag, out[tag], flush=True)
    out["rtt_ms"] = round(bench._rtt_ms(), 1)
    a = min(out["xla_two_part"]["ms_step"], out["xla_two_part_2"]["ms_step"])
    b = out["append_kernel"]["ms_step"]
    out["append_vs_xla_ms"] = round(b - a, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
