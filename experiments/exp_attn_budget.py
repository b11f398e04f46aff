"""Round-4: decompose the decode attention cost (the #1 block post-RTT fix).

BENCH_r04-to-be: t_attn = 1.948 ms at b128 = 122 us/layer, vs a ~59 us
KV-stream floor (37.7 MB codes+scales per layer at the ~639 GB/s anchor).
This uses the REAL flagship decode path (bench.py's _bench_decode with the
new chained + RTT-subtracted timing) and the _fresh_attention benchmark
ablations to split the gap:

    full        = everything
    -softmax    = ablate ("softmax",): raw scores as probs — keeps both
                  int8 dots, both requants, all streams; drops
                  softcap/mask/where/softmax passes
    -pv         = ablate ("softmax", "pv"): additionally drops the PV
                  requant + second dot
    -attn       = ablate ("attn",): no attention core at all

so:  softmax-glue = full − (−softmax)
     pv+requant   = (−softmax) − (−pv)
     qk dot+mask-stream = (−pv) − (−attn)

Usage: python experiments/exp_attn_budget.py
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
    params = fuse_model(params, cfg, qcfg)
    params = stack_model(params)

    out = {"rtt_ms": round(_rtt_ms(), 1)}
    cases = [
        ("full", ("head",)),
        ("nosoftmax", ("head", "softmax")),
        ("nopv", ("head", "softmax", "pv")),
        ("noattn", ("head", "attn")),
    ]
    for tag, ab in cases:
        best = None
        for _ in range(2):
            _, _, ms = _bench_decode(params, cfg, qcfg=qcfg, ablate=ab)
            best = ms if best is None else min(best, ms)
        out[tag + "_ms"] = round(best, 3)
        print(f"{tag:10s} {best:6.3f} ms/step", flush=True)

    L = cfg.num_layers
    out["softmax_glue_us_per_layer"] = round(
        (out["full_ms"] - out["nosoftmax_ms"]) / L * 1e3, 1)
    out["pv_requant_us_per_layer"] = round(
        (out["nosoftmax_ms"] - out["nopv_ms"]) / L * 1e3, 1)
    out["qk_stream_us_per_layer"] = round(
        (out["nopv_ms"] - out["noattn_ms"]) / L * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
