"""In-engine A/B of the round-5 pair-planes int4 layout vs legacy.

Same-run, same process: the SAME calibrated model is packed once; the B
arm converts every stacked QTensor to the legacy "group halves" layout
(qformats.qtensor.to_group_halves — byte permutation of identical codes),
so both arms execute identical quantized math and differ ONLY in the
kernels' unpack/dot structure. Timing: bench.py's chained-dispatch recipe
(dependent executions, one device_get barrier, RTT subtracted).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import _bench_decode, _bench_ttft, _rtt_ms
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config
    from llm_compressor_tpu.qformats.qtensor import QTensor, to_group_halves
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(tiny=jax.default_backend() != "tpu")
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw", head_act="int8-g[-1]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = stack_model(fuse_model(params, cfg, qcfg))

    def walk(node):
        if isinstance(node, QTensor):
            return to_group_halves(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    legacy = walk(params)
    n_pair = sum(1 for l in jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QTensor))
        if isinstance(l, QTensor) and l.pair_planes)
    print(f"pair-packed QTensors: {n_pair}; rtt {_rtt_ms():.1f} ms",
          flush=True)

    for rnd in range(3):
        for name, p in (("pair", params), ("legacy", legacy)):
            tps, gbs, ms = _bench_decode(p, cfg, qcfg=qcfg)
            print(f"r{rnd} {name:7s} decode b128: {ms:6.3f} ms/step "
                  f"({tps:8.0f} tok/s, {gbs:5.1f} GB/s eff)", flush=True)
    for name, p in (("pair", params), ("legacy", legacy)):
        t = _bench_ttft(p, cfg, qcfg, 8)
        print(f"{name:7s} prefill b8x512 p50: {t:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
