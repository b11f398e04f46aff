"""Benchmark: INT4-packed decode throughput on the flagship (Llama-3.2-1B
shaped) model, single chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": R,
   "gbs_effective": G, "stream_gbs": S, "roofline_frac": F}

``value`` is decode tokens/sec/chip with int4-g128 packed weights executing
through the fused Pallas dequant-matmul; ``vs_baseline`` is the speedup over
the same model with dense bf16 weights (the reference publishes no
throughput numbers — BASELINE.md — so bf16-on-the-same-hardware is the
baseline). ``gbs_effective`` is bytes-touched per decode step (packed
weights + scales + the full KV window the kernels stream) divided by
step time; ``stream_gbs`` is an HBM stream anchor measured IN THE SAME RUN
(chip throughput swings ~3x across minutes — only the intra-run ratio
``roofline_frac`` is meaningful).
"""

import json
import sys
import time

import numpy as np


def _stream_gbs(iters=64, mib=512):
    """Same-run HBM stream anchor: one jitted fori_loop whose every
    iteration reads+writes a ``mib``-MiB f32 buffer (value-chained, so no
    iteration is tunnel-cache servable); fresh input values for the timed
    call (identical dispatches are served from a tunnel-side cache and
    'measure' impossible speeds — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":  # CPU CI: keep it instant
        iters, mib = 2, 8
    n = mib * 1024 * 1024 // 4
    x = jnp.arange(n, dtype=jnp.float32) * 1e-6

    @jax.jit
    def walk(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: a * 1.0000001 + 1.0, x)

    jax.device_get(walk(x)[:8])                   # compile (untimed)
    x2 = x + 2.0
    jax.device_get(x2[:8])                        # fresh values, queue drained
    t0 = time.perf_counter()
    jax.device_get(walk(x2)[:8])                  # device_get = real barrier
    dt = time.perf_counter() - t0
    return iters * 2 * x.nbytes / dt / 1e9


def _decode_bytes_per_step(params, cache):
    """Bytes touched by one decode step: every weight leaf (packed codes,
    scales, norms, the packed lm_head — the embedding table is excluded:
    decode gathers B rows of it, it is never streamed) plus the full KV
    window (codes + scales) the attention reads."""
    import jax

    embed_ids = {id(l) for l in jax.tree_util.tree_leaves(
        {k: params[k] for k in ("embed", "pos_embed") if k in params})}
    wbytes = sum(l.nbytes for l in jax.tree_util.tree_leaves(params)
                 if id(l) not in embed_ids)
    kvbytes = sum(a.nbytes for a in
                  (cache.k, cache.v, cache.k_scale, cache.v_scale)
                  if a is not None)
    return wbytes + kvbytes


def _bench_decode(params, cfg, qcfg=None, steps=32, warmup=8, batch=128,
                  prefill_len=128):
    import jax
    import jax.numpy as jnp

    from llm_compressor_tpu.engine import decode_greedy_steps, init_cache

    rng = np.random.default_rng(0)
    # Skip the prefill compile (it isn't timed): a zero cache advanced to
    # prefill_len has identical decode cost to a real one. Greedy decoding
    # runs as ONE jitted lax.scan over the steps — the serving fast path
    # (per-dispatch tunnel latency is ~5 ms; see engine.decode_greedy_steps).
    # cache length padded to 128 so the fused int8-KV decode-attention
    # kernel engages (kernels/decode_attention.py supported())
    max_len = -(-(prefill_len + steps + warmup + 2) // 128) * 128
    cache = init_cache(cfg.num_layers, batch, max_len,
                       cfg.num_kv_heads, cfg.head_dim, quantized=True)
    cache = cache.replace(lengths=jnp.full((batch,), prefill_len, jnp.int32))

    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)).astype(np.int32))
    # warm call = compile + cache-warm of the SAME n-step executable.
    # NOTE: block_until_ready can return at ENQUEUE on the axon tunnel —
    # a small device_get is the only reliable completion barrier (CLAUDE.md)
    toks, cache = decode_greedy_steps(params, tok, cache, n=steps,
                                      cfg=cfg, qcfg=qcfg)
    jax.device_get(toks)

    t0 = time.perf_counter()
    toks, cache = decode_greedy_steps(params, toks[:, -1:], cache, n=steps,
                                      cfg=cfg, qcfg=qcfg)
    jax.device_get(toks)
    dt = time.perf_counter() - t0
    gbs = _decode_bytes_per_step(params, cache) * steps / dt / 1e9
    return batch * steps / dt, gbs


def main():
    import jax

    try:  # persistent compile cache cuts repeat-run latency
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    on_tpu = jax.default_backend() == "tpu"

    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(tiny=not on_tpu)
    # the reference's headline W4A8 config: int4-g128 weights, int8/token
    # acts; the vocab head packs to int8-g128 (near-lossless at 8 bits,
    # and 1.87x over a bf16 head with the K-tiled kernel — the head is the
    # single largest weight stream at decode).
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw")

    params = init_params(cfg, jax.random.PRNGKey(0))

    bf16_tps, _ = _bench_decode(stack_model(fuse_model(
        jax.tree_util.tree_map(lambda x: x, params), cfg, None)), cfg)

    rtn(params, cfg, qcfg)          # weights onto the int4 grid (+ int8 head)
    pack_model(params, cfg, qcfg)   # real packed QTensors (fused W4A8 path)
    params = fuse_model(params, cfg, qcfg)  # qkv|gateup concat (one launch)
    params = stack_model(params)    # scan-over-layers: O(1) compile depth
    int4_tps, gbs = _bench_decode(params, cfg, qcfg=qcfg)
    stream = _stream_gbs()

    print(json.dumps({
        "metric": "llama1b_w4a8g128_decode_tokens_per_sec_per_chip",
        "value": round(int4_tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(int4_tps / bf16_tps, 3),
        "gbs_effective": round(gbs, 1),
        "stream_gbs": round(stream, 1),
        "roofline_frac": round(gbs / stream, 3),
        "batch": 128,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({
            "metric": "llama1b_w4a8g128_decode_tokens_per_sec_per_chip",
            "value": 0.0,
            "unit": "tok/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(0)
