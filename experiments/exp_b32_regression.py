"""Why is int4 decode at batch 32 slower than bf16? (BENCH r3 anomaly:
decode_tps_b32 1957 vs bf16_tps_b32 5511 — int4 @ b128 is 2.8x bf16.)

Interleaved, same-run ms/step for:
  int4 fresh-block path   @ b32 / b128
  int4 carried-cache path @ b32 (LLMC_NO_FRESH traced via distinct n)
  bf16 (carried)          @ b32
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from bench import _bench_decode
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
    params = stack_model(fuse_model(params, cfg, qcfg))

    def t(pp, qq, batch, steps):
        _, _, ms = _bench_decode(pp, cfg, qcfg=qq, steps=steps, batch=batch)
        return ms

    out = {}
    variants = [
        ("int4_fresh_b32",   lambda: t(params, qcfg, 32, 32)),
        ("int4_carried_b32", None),  # filled below (env-gated trace)
        ("int4_fresh_b128",  lambda: t(params, qcfg, 128, 32)),
        ("bf16_b32",         lambda: t(bf16, None, 32, 32)),
    ]
    def carried():
        os.environ["LLMC_NO_FRESH"] = "1"
        try:
            return t(params, qcfg, 32, 30)  # distinct n => fresh trace
        finally:
            del os.environ["LLMC_NO_FRESH"]
    variants[1] = ("int4_carried_b32", carried)

    for name, fn in variants:  # warm/compile pass (untimed)
        fn()
    for rnd in range(2):       # interleaved timed rounds
        for name, fn in variants:
            out.setdefault(name, []).append(round(fn(), 3))
    print(json.dumps(out))

if __name__ == "__main__":
    main()
