#!/usr/bin/env python
"""TPU lowering smoke gate (VERDICT r4 item 2).

AOT-compiles (lower + compile, no timed execution) every Pallas kernel
variant AND the full serving entry points at the flagship per-layer shapes
on the real TPU backend. Interpret-mode unit tests prove numerics but never
Mosaic lowerability — BENCH_r04 recorded 0.0 tok/s because a kernel that
passed the CPU suite was unlowerable on the chip. Run this before ANY
end-of-round commit, then `LLMC_BENCH_FAST=1 python bench.py` as the final
pre-snapshot check (CLAUDE.md "Testing / verification").

    python scripts/tpu_smoke.py          # ~2-6 min over the axon tunnel

Uses a 2-layer flagship-shaped config: per-layer kernel tile shapes are
identical to the 16-layer model (stacking only changes the scalar-prefetch
L dim), the compile payload stays far under the tunnel's 100 MB cap, and
compile time stays in minutes. Exits non-zero on any lowering failure.

Reference analog: the round workflow gate the reference lacks entirely —
its CUDA kernel ships with on-device pytest (third_party/
fast-hadamard-transform/tests/); this is the TPU equivalent for a backend
where "compiles on CPU" does not imply "lowers on Mosaic".
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILURES = []


def gate(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            try:
                fn()
                print(f"  PASS  {name}  ({time.perf_counter() - t0:.1f}s)",
                      flush=True)
            except Exception as e:
                FAILURES.append(name)
                print(f"  FAIL  {name}: {type(e).__name__}: "
                      f"{str(e)[:500]}", flush=True)
                if os.environ.get("LLMC_SMOKE_TRACE"):
                    traceback.print_exc()
        return run
    return deco


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    backend = jax.default_backend()
    print(f"backend: {backend}", flush=True)
    if backend != "tpu" and not os.environ.get("LLMC_SMOKE_ALLOW_CPU"):
        print("FAIL: not on a TPU backend — this gate only means anything "
              "on real Mosaic lowering (set LLMC_SMOKE_ALLOW_CPU=1 to "
              "exercise the script itself on CPU).", flush=True)
        sys.exit(2)

    from __graft_entry__ import _flagship_cfg
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.engine import (
        decode_greedy_steps,
        init_cache,
        prefill,
    )
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config

    import dataclasses

    cfg = dataclasses.replace(_flagship_cfg(), num_layers=2)
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw", head_act="int8-g[-1]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = fuse_model(params, cfg, qcfg)
    params = stack_model(params)

    batch, steps, prefill_len = 128, 32, 128
    max_len = 256
    cache = init_cache(cfg.num_layers, batch, max_len, cfg.num_kv_heads,
                       cfg.head_dim, quantized=True)
    cache = cache.replace(
        lengths=jnp.full((batch,), prefill_len, jnp.int32))
    tok = jnp.zeros((batch, 1), jnp.int32)

    @gate("decode_greedy_steps (bench serving path, b128)")
    def g_decode():
        decode_greedy_steps.lower(params, tok, cache, n=steps, cfg=cfg,
                                  qcfg=qcfg).compile()
    g_decode()

    @gate("prefill (b8 x 512, head-last routing)")
    def g_prefill():
        c8 = init_cache(cfg.num_layers, 8, 1024, cfg.num_kv_heads,
                        cfg.head_dim, quantized=True)
        t8 = jnp.zeros((8, 512), jnp.int32)
        prefill.lower(params, t8, c8, cfg=cfg, qcfg=qcfg).compile()
    g_prefill()

    @gate("decode_greedy_steps b1 (tinychat shape)")
    def g_decode_b1():
        c1 = init_cache(cfg.num_layers, 1, max_len, cfg.num_kv_heads,
                        cfg.head_dim, quantized=True)
        c1 = c1.replace(lengths=jnp.full((1,), prefill_len, jnp.int32))
        decode_greedy_steps.lower(params, jnp.zeros((1, 1), jnp.int32), c1,
                                  n=steps, cfg=cfg, qcfg=qcfg).compile()
    g_decode_b1()

    # ---- standalone kernel variants (incl. opt-in paths the default
    # serving graph does not contain) --------------------------------
    from llm_compressor_tpu.qformats import ElemFormat, Quantizer
    from llm_compressor_tpu.qformats import quantize_pack

    rng = np.random.default_rng(0)
    E, I, g = cfg.hidden_size, cfg.intermediate_size, 128

    def mk_qt(N, C, fmt=ElemFormat.int4, gs=128):
        q = Quantizer(qtype="int", fmt=fmt, group_size=gs)
        qt = quantize_pack(q, jnp.asarray(
            rng.normal(0, 0.1, size=(N, C)).astype(np.float32)))
        st = qt.scales.reshape(N, C // gs).T
        return qt.replace(scales_t=st)

    def mk_stacked(L, N, C, fmt=ElemFormat.int4, gs=128):
        qts = [mk_qt(N, C, fmt, gs) for _ in range(L)]
        codes = jnp.stack([t.codes for t in qts])
        scales = jnp.stack([t.scales for t in qts])
        st = jnp.stack([t.scales_t for t in qts])
        return qts[0].replace(codes=codes, scales=scales, scales_t=st)

    xdec = jnp.asarray(rng.normal(size=(batch, E)), jnp.bfloat16)

    @gate("w4a8 flat kernel (decode M=128, int4 g128)")
    def g_w4a8():
        from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
        jax.jit(w4a8_matmul).lower(xdec, mk_qt(E, E)).compile()
    g_w4a8()

    @gate("w4a8 stacked kernel (scalar-prefetch layer)")
    def g_w4a8_stacked():
        from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
        jax.jit(lambda x, qt, li: w4a8_matmul(x, qt, layer=li)).lower(
            xdec, mk_stacked(2, E, E), jnp.int32(0)).compile()
    g_w4a8_stacked()

    @gate("w4a8 act-inside kernel")
    def g_w4a8_actq():
        from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
        jax.jit(lambda x, qt: w4a8_matmul(x, qt, act_inside=True)).lower(
            xdec, mk_qt(E, E)).compile()
    g_w4a8_actq()

    @gate("w4a8 fused gateup+silu kernel (BENCH_r04 crash site)")
    def g_gateup():
        from llm_compressor_tpu.kernels.w4a8_matmul import (
            gateup_silu_matmul,
            gateup_silu_ok,
        )
        qt = mk_stacked(2, 2 * I, E)
        assert gateup_silu_ok(qt, "silu")
        jax.jit(lambda x, qt, li: gateup_silu_matmul(x, qt, "silu", li)
                ).lower(xdec, qt, jnp.int32(0)).compile()
    g_gateup()

    @gate("w4a8 int8 head kernel (128k rows)")
    def g_head():
        from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
        qt = mk_stacked(1, cfg.vocab_size, E, ElemFormat.int8, 128)
        jax.jit(lambda x, qt, li: w4a8_matmul(x, qt, layer=li)).lower(
            xdec, qt, jnp.int32(0)).compile()
    g_head()

    @gate("dequant-matmul kernels (int4/int8/fp8)")
    def g_dequant():
        from llm_compressor_tpu.kernels.dequant_matmul import dequant_matmul
        for fmt in (ElemFormat.int4, ElemFormat.int8, ElemFormat.fp8_e4m3):
            q = Quantizer(qtype="int" if fmt in (ElemFormat.int4,
                                                 ElemFormat.int8) else "fp",
                          fmt=fmt, group_size=128)
            qt = quantize_pack(q, jnp.asarray(
                rng.normal(0, 0.1, size=(E, E)).astype(np.float32)))
            jax.jit(dequant_matmul).lower(xdec, qt).compile()
    g_dequant()

    @gate("hadamard Pallas kernel (2048 / 4096)")
    def g_had():
        from llm_compressor_tpu.kernels.hadamard import (
            hadamard_transform_pallas,
        )
        for n in (2048, 4096):
            x = jnp.asarray(rng.normal(size=(8, n)), jnp.bfloat16)
            jax.jit(hadamard_transform_pallas).lower(x).compile()
    g_had()

    @gate("fused-append decode-attention kernel (round 5)")
    def g_attn_append():
        from llm_compressor_tpu.engine.kvcache import init_cache as mk_cache
        from llm_compressor_tpu.engine.kvcache import init_fresh
        from llm_compressor_tpu.kernels import decode_attention as da
        KV, D, S, Wf = cfg.num_kv_heads, cfg.head_dim, 256, 32
        r = cfg.num_heads // KV
        L = cfg.num_layers
        qi = jnp.zeros((batch, KV, r, D), jnp.int8)
        qsc = jnp.ones((batch, KV, r, 1), jnp.float32)
        c = mk_cache(L, batch, S, KV, D, quantized=True)
        fr = init_fresh(L, batch, Wf, KV, D, quantized=True)
        new_kv = (jnp.zeros((batch, KV, D, 1), jnp.int8),
                  jnp.zeros((batch, KV, D, 1), jnp.int8),
                  jnp.ones((batch, KV, 1, 1), jnp.float32),
                  jnp.ones((batch, KV, 1, 1), jnp.float32))
        mlen = jnp.full((batch,), 128, jnp.int32)
        jax.jit(lambda qi, qsc, ck, cv, cks, cvs, fk, fv, fks, fvs, nkv:
                da.decode_attention_append(
                    qi, qsc, c.replace(k=ck, v=cv, k_scale=cks, v_scale=cvs),
                    fr.replace(k=fk, v=fv, k_scale=fks, v_scale=fvs),
                    nkv, jnp.int32(0), mlen, mlen, jnp.int32(0),
                    jnp.int32(3), scale=float(D) ** -0.5)).lower(
            qi, qsc, c.k, c.v, c.k_scale, c.v_scale,
            fr.k, fr.v, fr.k_scale, fr.v_scale, new_kv).compile()
    g_attn_append()

    @gate("fused decode-attention kernel (opt-in LLMC_FUSED_ATTN)")
    def g_attn():
        from llm_compressor_tpu.kernels import decode_attention as da
        KV, D, S = cfg.num_kv_heads, cfg.head_dim, 256
        r = cfg.num_heads // KV
        L = cfg.num_layers
        q = jnp.asarray(rng.normal(size=(batch, KV, r, D)), jnp.bfloat16)
        kc = jnp.zeros((L, batch, KV, D, S), jnp.int8)
        vc = jnp.zeros((L, batch, KV, D, S), jnp.int8)
        ks = jnp.ones((L, batch, KV, 1, S), jnp.float32)
        vs = jnp.ones((L, batch, KV, 1, S), jnp.float32)
        mlen = jnp.full((batch,), 128, jnp.int32)
        pos = jnp.full((batch,), 128, jnp.int32)
        jax.jit(lambda *a: da.decode_attention(
            *a, scale=float(D) ** -0.5)).lower(
            q, kc, vc, ks, vs, jnp.int32(0), mlen, pos,
            jnp.int32(S)).compile()
    g_attn()

    print(flush=True)
    if FAILURES:
        print(f"SMOKE FAIL: {len(FAILURES)} gate(s) did not lower: "
              f"{FAILURES}", flush=True)
        sys.exit(1)
    print("SMOKE PASS: all kernels + serving entry points lower on "
          f"{backend}.", flush=True)


if __name__ == "__main__":
    main()
