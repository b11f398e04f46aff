"""Decode-step ablation: where does the non-weight time go?

Monkeypatches pieces of the cached forward (head -> tiny slice, attention
core -> identity, mlp -> identity) and times scan-decode intra-run.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import importlib

gen = importlib.import_module("llm_compressor_tpu.engine.generate")
tr = importlib.import_module("llm_compressor_tpu.models.transformer")


def bench(params, cfg, qcfg, tag, batch=32, steps=32):
    from llm_compressor_tpu.engine.kvcache import init_cache

    rng = np.random.default_rng(0)
    cache = init_cache(cfg.num_layers, batch, 128 + 2 * steps + 2,
                       cfg.num_kv_heads, cfg.head_dim, quantized=True)
    cache = cache.replace(lengths=jnp.full((batch,), 128, jnp.int32))
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))

    # fresh jit per ablation (the monkeypatch changes the traced graph)
    def steps_fn(p, t, c, n):
        def body(carry, _):
            tk, cc = carry
            logits, cc = gen._forward_cached(p, cfg, tk, cc, None, qcfg)
            cc = cc.replace(lengths=cc.lengths + 1)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
            return (nxt, cc), nxt[:, 0]
        (tk, cc), toks = jax.lax.scan(body, (t, c), length=n)
        return toks, cc

    run = jax.jit(lambda p, t, c: steps_fn(p, t, c, steps), donate_argnums=(2,))
    toks, cache = run(params, tok, cache)
    toks.block_until_ready()
    t0 = time.perf_counter()
    toks, cache = run(params, toks[-1][:, None], cache)
    toks.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    print(f"{tag:36s} {dt*1e3:8.2f} ms/step {batch/dt:9.0f} tok/s")
    return dt


def main():
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config
    from __graft_entry__ import _flagship_cfg

    print(f"backend={jax.default_backend()}")
    cfg = _flagship_cfg()
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    sp = stack_model(fuse_model(params, cfg, qcfg))
    del params

    t_full = bench(sp, cfg, qcfg, "full")

    orig_head = tr.head
    orig_attn = gen._cached_attention
    orig_mlp = tr.mlp

    # no head: logits = broadcast of a (B, 1) slice
    def tiny_head(p, c, h, qc=None):
        return jnp.broadcast_to(h[..., :1].astype(jnp.float32),
                                h.shape[:-1] + (cfg.vocab_size,))
    gen.head = tiny_head
    t_nohead = bench(sp, cfg, qcfg, "head ablated")
    gen.head = orig_head

    # attention core -> qkv proj + cache write only, skip scores/softmax/o
    def no_attn(lp, c, li, x, positions, cache, start, ops):
        return jnp.zeros_like(x), cache
    gen._cached_attention = no_attn
    t_noattn = bench(sp, cfg, qcfg, "attention ablated")
    gen._cached_attention = orig_attn

    def no_mlp(lp, c, x, ops=None, taps=None):
        return jnp.zeros_like(x)
    gen.mlp = no_mlp
    t_nomlp = bench(sp, cfg, qcfg, "mlp ablated")
    gen.mlp = orig_mlp

    print(f"head  ~ {1e3*(t_full-t_nohead):6.2f} ms")
    print(f"attn  ~ {1e3*(t_full-t_noattn):6.2f} ms (incl qkv+o matmuls)")
    print(f"mlp   ~ {1e3*(t_full-t_nomlp):6.2f} ms")


if __name__ == "__main__":
    main()
