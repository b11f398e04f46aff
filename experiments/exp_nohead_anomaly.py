"""Scaling probe for the nohead-slower-than-full anomaly (round 5).

bench.py's interleaved budget reproduced, across independent runs, that
the HEAD-ABLATED decode program is ~1.4 ms/step SLOWER than the full one
at b128/S=256 — removing ~0.4 ms of head kernel makes the program
slower. The only structural differences: argmax reads the 2048-wide
hidden instead of the 128k logits, and the scan body ends in XLA ops
instead of the opaque packed-head Pallas call.

This probe maps the anomaly over (batch, window): if it scales with
batch it lives in the argmax/embed feedback; if constant it is a
per-step scheduling/pipelining artifact of ending the scan body without
an opaque call.
"""

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

    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config
    from __graft_entry__ import _flagship_cfg
    import bench as B

    cfg = _flagship_cfg(tiny=jax.default_backend() != "tpu")
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw", head_act="int8-g[-1]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = fuse_model(params, cfg, qcfg)
    params = stack_model(params)

    grid = [  # (batch, prefill_len -> S)
        (128, 128), (128, 896), (32, 128), (32, 896)]
    for rnd in range(3):
        print(f"--- round {rnd}", flush=True)
        for batch, pf in grid:
            ms_full = B._bench_decode(params, cfg, qcfg=qcfg, batch=batch,
                                      prefill_len=pf, seed=rnd + 20)[2]
            ms_nh = B._bench_decode(params, cfg, qcfg=qcfg, batch=batch,
                                    prefill_len=pf, ablate=("head",),
                                    seed=rnd + 20)[2]
            S = -(-(pf + 4 * 32) // 128) * 128
            print(f"  b{batch:<4d} S={S:<5d} full {ms_full:7.3f}  "
                  f"nohead {ms_nh:7.3f}  delta {ms_nh - ms_full:+7.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
