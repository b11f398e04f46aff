"""Decode-path breakdown on the real chip: where does the W4A8 step lose
to bf16? Times each matmul shape (bf16 dot vs fused w4a8 kernel), the
vocab head, the activation-quant pass, and the full decode step.

Run on the axon chip:  python scripts/profile_decode.py
(~2x run-to-run variance on the tunnel — compare numbers within one run.)
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


def timeit(name, fn, *args, steps=64, warmup=4):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:48s} {dt*1e6:10.1f} us")
    return dt


def main():
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.kernels.w4a8_matmul import (
        quantize_acts_per_token, w4a8_matmul)
    from llm_compressor_tpu.models import init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config
    from llm_compressor_tpu.qformats.qtensor import quantize_pack
    from llm_compressor_tpu.qformats.config import parse_qspec
    from __graft_entry__ import _flagship_cfg

    B = 32
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  batch={B}")

    w4spec = parse_qspec("int4-g[128]-rw")

    # --- per-shape matmul: bf16 dot vs fused w4a8 -------------------------
    shapes = [(2048, 2048, "q/o"), (512, 2048, "k/v"), (8192, 2048, "gate/up"),
              (2048, 8192, "down"), (3072, 2048, "qkv-fused"),
              (16384, 2048, "gateup-fused"), (128256, 2048, "head")]
    bf16_dot = jax.jit(lambda x, w: jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ()))))
    for N, C, tag in shapes:
        w = jnp.asarray(rng.standard_normal((N, C)) * 0.02, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, C)), jnp.bfloat16)
        tb = timeit(f"bf16   ({B}x{C})@({N}x{C})^T  [{tag}]", bf16_dot, x, w)
        qt = quantize_pack(w4spec, w)
        tw = timeit(f"w4a8   ({B}x{C})@({N}x{C})^T  [{tag}]",
                    jax.jit(w4a8_matmul), x, qt)
        bf16_bytes = N * C * 2
        w4_bytes = N * C // 2 + (N * C // 128) * 4
        print(f"    ratio w4/bf16 = {tw/tb:.2f}   bytes ratio = {w4_bytes/bf16_bytes:.2f}"
              f"   bf16 GB/s = {bf16_bytes/tb/1e9:.0f}   w4 GB/s(packed) = {w4_bytes/tw/1e9:.0f}")

    # --- act quant alone ---------------------------------------------------
    x = jnp.asarray(rng.standard_normal((B, 2048)), jnp.bfloat16)
    timeit("act quant per-token (32x2048)", jax.jit(quantize_acts_per_token), x)

    # --- full decode steps -------------------------------------------------
    from llm_compressor_tpu.engine import decode_step, init_cache

    cfg = _flagship_cfg()
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None, None)
    params = init_params(cfg, jax.random.PRNGKey(0))

    def bench_decode(p, qc, tag):
        cache = init_cache(cfg.num_layers, B, 256, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        cache = cache.replace(lengths=jnp.full((B,), 128, jnp.int32))
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 1)).astype(np.int32))
        step = partial(decode_step, cfg=cfg, qcfg=qc)

        def run(p, tok, cache, n=8):
            for _ in range(n):
                logits, cache = step(p, tok, cache)
            return logits, cache

        for _ in range(2):
            logits, cache = run(p, tok, cache)
        logits.block_until_ready()
        t0 = time.perf_counter()
        reps = 8
        for _ in range(reps):
            logits, cache = run(p, tok, cache)
        logits.block_until_ready()
        dt = (time.perf_counter() - t0) / (reps * 8)
        print(f"decode {tag:32s} {dt*1e3:8.2f} ms/step   {B/dt:8.0f} tok/s")
        return dt

    bench_decode(stack_model(params), None, "bf16")
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    sp = stack_model(params)
    bench_decode(sp, qcfg, "w4a8 (int4-g128)")


if __name__ == "__main__":
    main()
