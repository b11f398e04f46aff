"""Decode-step variants on the real chip (flagship Llama-1B shapes).

Chained decode steps with donated caches are data-dependent, so the timing
is honest (identical repeated dispatches are not — the tunnel hides their
cost). Variants: bf16 / w4a8 x {unfused, fused} x {bf16, packed int4} head.

Run: python benchmarks/bench_decode_variants.py [batch]
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_decode(params, cfg, qcfg, tag, batch=32, steps=32, warmup=6,
                 prefill_len=128):
    from llm_compressor_tpu.engine import decode_step, init_cache

    rng = np.random.default_rng(0)
    cache = init_cache(cfg.num_layers, batch, prefill_len + steps + warmup + 2,
                       cfg.num_kv_heads, cfg.head_dim, quantized=True)
    cache = cache.replace(lengths=jnp.full((batch,), prefill_len, jnp.int32))
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))
    step = partial(decode_step, cfg=cfg, qcfg=qcfg)

    for _ in range(warmup):
        logits, cache = step(params, tok, cache)
    logits.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        logits, cache = step(params, tok, cache)
    logits.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    tps = batch / dt
    print(f"{tag:48s} {dt*1e3:8.2f} ms/step {tps:9.0f} tok/s")
    return tps


def main():
    import copy

    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config
    from __graft_entry__ import _flagship_cfg

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"backend={jax.default_backend()} batch={batch}")

    cfg = _flagship_cfg()
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None, None)
    qcfg_head = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                                   "int4-g[128]-rw")

    params = init_params(cfg, jax.random.PRNGKey(0))

    bench_decode(stack_model(copy.copy(params)), cfg, None, "bf16 unfused", batch)
    bf16_fused = stack_model(fuse_model(
        jax.tree_util.tree_map(lambda x: x, params), cfg, None))
    bf16_tps = bench_decode(bf16_fused, cfg, None, "bf16 fused", batch)
    del bf16_fused

    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)

    p_unfused = stack_model(copy.copy(params))
    bench_decode(p_unfused, cfg, qcfg, "w4a8 unfused bf16-head", batch)
    del p_unfused

    fused = fuse_model(params, cfg, qcfg)
    p_fused = stack_model(copy.copy(fused))
    w4_tps = bench_decode(p_fused, cfg, qcfg, "w4a8 fused bf16-head", batch)
    del p_fused

    # packed int4 head (tied embeddings -> pack a separate lm_head copy)
    pack_model(fused, cfg, qcfg_head)
    p_head = stack_model(fused)
    w4h_tps = bench_decode(p_head, cfg, qcfg_head, "w4a8 fused int4-head", batch)

    print(f"\nvs bf16-fused: w4a8 fused = {w4_tps/bf16_tps:.2f}x, "
          f"int4-head = {w4h_tps/bf16_tps:.2f}x")


if __name__ == "__main__":
    main()
