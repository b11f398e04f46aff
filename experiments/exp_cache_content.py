"""Does KV-cache CONTENT change decode-step time? (bench integrity probe)

The round-5 context-scaling measurement (t_step 5.27 ms at max_len 256 ->
6.88 at 1024, same program) implies the fused-append kernel's main-window
reads run at an apparent >1 TB/s — above this chip class's HBM rate. The
bench cache is ZERO-FILLED (init_cache + lengths forced forward without
writing content); if any layer of the memory path favors zeros, the bench
headline is optimistic vs real serving where the cache holds real codes.

A/B, interleaved x3 rounds, RTT-subtracted, at max_len 256 and 1024:
  zeros — the bench's zero-filled cache as-is
  rand  — same shapes, k/v codes filled with random int8, scales ~U(0.5,1.5)
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

    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.engine import decode_greedy_steps, init_cache
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config
    from __graft_entry__ import _flagship_cfg
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as B

    cfg = _flagship_cfg(tiny=jax.default_backend() != "tpu")
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw", head_act="int8-g[-1]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = fuse_model(params, cfg, qcfg)
    params = stack_model(params)

    rng = np.random.default_rng(0)
    steps, chain, batch = 32, 2, 128

    def run_once(prefill_len, fill, seed):
        max_len = -(-(prefill_len + (chain + 2) * steps) // 128) * 128
        cache = init_cache(cfg.num_layers, batch, max_len,
                           cfg.num_kv_heads, cfg.head_dim, quantized=True)
        if fill == "rand":
            r = np.random.default_rng(seed + 100)
            cache = cache.replace(
                k=jnp.asarray(r.integers(-127, 128, cache.k.shape)
                              .astype(np.int8)),
                v=jnp.asarray(r.integers(-127, 128, cache.v.shape)
                              .astype(np.int8)),
                k_scale=jnp.asarray(
                    r.uniform(0.5, 1.5, cache.k_scale.shape)
                    .astype(np.float32)),
                v_scale=jnp.asarray(
                    r.uniform(0.5, 1.5, cache.v_scale.shape)
                    .astype(np.float32)))
        cache = cache.replace(
            lengths=jnp.full((batch,), prefill_len, jnp.int32))
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1))
                          .astype(np.int32))
        toks, cache = decode_greedy_steps(params, tok, cache, n=steps,
                                          cfg=cfg, qcfg=qcfg)
        jax.device_get(toks)
        toks, cache = decode_greedy_steps(params, toks[:, -1:], cache,
                                          n=steps, cfg=cfg, qcfg=qcfg)
        jax.device_get(toks)
        t0 = time.perf_counter()
        for _ in range(chain):
            toks, cache = decode_greedy_steps(params, toks[:, -1:], cache,
                                              n=steps, cfg=cfg, qcfg=qcfg)
        jax.device_get(toks)
        dt = time.perf_counter() - t0 - B._rtt_ms() / 1e3
        return dt / (chain * steps) * 1e3

    cfgs = [(128, "zeros"), (128, "rand"), (896, "zeros"), (896, "rand")]
    for rnd in range(3):
        print(f"--- round {rnd}", flush=True)
        for pf, fill in cfgs:
            ms = run_once(pf, fill, seed=rnd)
            S = -(-(pf + (chain + 2) * steps) // 128) * 128
            print(f"  S={S:5d} {fill:5s}  {ms:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
