"""Reproduce the bench's slow int4-b32: exact bench sequence in one
process (bf16 b128 -> int4 b128 -> stream anchor -> int4 b32 -> bf16 b32),
then re-measure int4 b32 interleaved with bf16 b32. If int4-b32 is slow
only after the earlier phases, some process state (allocator layout?
stream buffer?) degrades it; if slow everywhere here but fast in
exp_b32_regression.py, the difference is elsewhere."""
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
    params = stack_model(fuse_model(params, cfg, qcfg))

    out = {}
    _, _, ms = _bench_decode(bf16, cfg)                 # bf16 b128
    out["bf16_b128_ms"] = round(ms, 3)
    _, _, ms = _bench_decode(params, cfg, qcfg=qcfg)    # int4 b128
    out["int4_b128_ms"] = round(ms, 3)
    out["stream_gbs"] = round(_stream_gbs(), 1)
    _, _, ms = _bench_decode(params, cfg, qcfg=qcfg, batch=32)
    out["int4_b32_first_ms"] = round(ms, 3)             # the bench's slot
    _, _, ms = _bench_decode(bf16, cfg, batch=32)
    out["bf16_b32_first_ms"] = round(ms, 3)
    for rnd in range(2):                                # interleaved re-runs
        _, _, ms = _bench_decode(params, cfg, qcfg=qcfg, batch=32)
        out.setdefault("int4_b32_ms", []).append(round(ms, 3))
        _, _, ms = _bench_decode(bf16, cfg, batch=32)
        out.setdefault("bf16_b32_ms", []).append(round(ms, 3))
    print(json.dumps(out))

if __name__ == "__main__":
    main()
