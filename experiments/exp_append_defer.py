"""Three-way decode A/B (round 5): XLA two-part vs fused-append kernel
with fresh outputs (emit) vs deferred-write (kernel outputs only o; the
token rows DUS into the fresh carry once per step).

Run: python experiments/exp_append_defer.py
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

    modes = (
        ("xla", False, False, ("dz_a",)),
        ("append_emit", True, False, ("dz_b",)),
        ("append_defer", True, True, ("dz_c",)),
        ("append_defer_2", True, True, ("dz_d",)),   # steady-state check
        ("xla_2", False, False, ("dz_e",)),          # drift bound
    )
    out = {}
    for pf in (128, 896):
        for tag, optin, defer, abl in modes:
            gen._ATTN_APPEND_OPTIN = optin
            gen._APPEND_DEFER = defer
            _, gbs, ms = bench._bench_decode(
                params, cfg, qcfg=qcfg, prefill_len=pf,
                ablate=tuple(a + f"_{pf}" for a in abl))
            out[f"{tag}_pf{pf}_ms"] = round(ms, 3)
            print(f"pf={pf} {tag}: {ms:.3f} ms/step ({gbs:.0f} GB/s)",
                  flush=True)
    out["rtt_ms"] = round(bench._rtt_ms(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
