"""A/B: alias-accumulator fresh outputs vs the ys "emit" form (round 5).

The emit form stacks per-layer fresh blocks as scan ys (~34 us/layer of
stacking, exp_append_dissect.py); alias mode writes each layer's block
straight into the carried (L, ...) buffer via WRITE-ONLY
input_output_aliases — the kernel never reads the aliased buffer, so
neither round-4 failure mode (copy-protection of read buffers /
serialization of read-modify-write aliasing) should apply. This measures
whether Mosaic/XLA agree.

Run: python experiments/exp_append_alias.py
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
    for pf in (128, 896):
        for tag, alias, abl in (("emit", False, ("al_a",)),
                                ("alias", True, ("al_b",)),
                                ("emit_2", False, ("al_c",)),
                                ("alias_2", True, ("al_d",))):
            gen._APPEND_ALIAS = alias
            try:
                _, gbs, ms = bench._bench_decode(
                    params, cfg, qcfg=qcfg, prefill_len=pf,
                    ablate=tuple(a + f"_{pf}" for a in abl), chain=4)
                out[f"{tag}_pf{pf}_ms"] = round(ms, 3)
                print(f"pf={pf} {tag}: {ms:.3f} ms/step ({gbs:.0f} GB/s)",
                      flush=True)
            except Exception as e:
                out[f"{tag}_pf{pf}_ms"] = f"FAIL: {str(e)[:200]}"
                print(f"pf={pf} {tag}: FAIL {str(e)[:300]}", flush=True)
    out["rtt_ms"] = round(bench._rtt_ms(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
