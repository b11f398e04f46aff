"""Packed int4 head vs bf16 head on the scan-decode serving path.

With the K-tiled kernel + in-kernel epilogue, re-decide the head format
(an older full-K kernel lost to bf16 here). Intra-run comparison only.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(params, cfg, qcfg, tag, batch=32, steps=32):
    from llm_compressor_tpu.engine import decode_greedy_steps, init_cache

    rng = np.random.default_rng(0)
    cache = init_cache(cfg.num_layers, batch, 128 + 2 * steps + 2,
                       cfg.num_kv_heads, cfg.head_dim, quantized=True)
    cache = cache.replace(lengths=jnp.full((batch,), 128, jnp.int32))
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))
    toks, cache = decode_greedy_steps(params, tok, cache, n=steps, cfg=cfg, qcfg=qcfg)
    toks.block_until_ready()
    t0 = time.perf_counter()
    toks, cache = decode_greedy_steps(params, toks[:, -1:], cache, n=steps,
                                      cfg=cfg, qcfg=qcfg)
    toks.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    print(f"{tag:40s} {dt*1e3:8.2f} ms/step {batch/dt:9.0f} tok/s")
    return batch / dt


def main():
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config
    from __graft_entry__ import _flagship_cfg

    print(f"backend={jax.default_backend()}")
    cfg = _flagship_cfg()
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None, None)
    qcfg_h4 = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                                 "int4-g[128]-rw")
    qcfg_h8 = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                                 "int8-g[128]-rw")

    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    fused = fuse_model(params, cfg, qcfg)

    sp = stack_model(jax.tree_util.tree_map(lambda x: x, fused))
    t_bf = bench(sp, cfg, qcfg, "w4a8 layers + bf16 head")
    del sp

    pack_model(fused, cfg, qcfg_h4)  # adds packed int4 lm_head copy
    sp = stack_model(jax.tree_util.tree_map(lambda x: x, fused))
    t_h4 = bench(sp, cfg, qcfg_h4, "w4a8 layers + int4-g128 head")
    del sp

    del fused["lm_head"]
    pack_model(fused, cfg, qcfg_h8)
    sp = stack_model(fused)
    t_h8 = bench(sp, cfg, qcfg_h8, "w4a8 layers + int8-g128 head")

    print(f"int4 head vs bf16 head: {t_h4/t_bf:.3f}x   int8: {t_h8/t_bf:.3f}x")


if __name__ == "__main__":
    main()
