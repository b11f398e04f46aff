"""A/B: merge_fresh uniform-DUS fast path (now default) + in-kernel q
row-quant (LLMC_ATTN_QUANT_Q) vs the XLA-prologue form.

Run: python experiments/exp_append_quantq.py
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
    for tag, qq, abl in (("xlaq_mergefast", False, ("qq_a",)),
                         ("kernelq_mergefast", True, ("qq_b",)),
                         ("xlaq_2", False, ("qq_c",)),
                         ("kernelq_2", True, ("qq_d",))):
        gen._APPEND_QUANT_Q = qq
        _, gbs, ms = bench._bench_decode(params, cfg, qcfg=qcfg, ablate=abl,
                                         chain=4)
        out[tag + "_ms"] = round(ms, 3)
        print(tag, round(ms, 3), "ms/step", f"({gbs:.0f} GB/s)", flush=True)
    out["rtt_ms"] = round(bench._rtt_ms(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
