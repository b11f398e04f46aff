"""Round-4: why does ENGINE decode attention run ~2x slower than the
isolated xla_codes attention?

bench_attention_variants.py (B=128 S=256): xla_codes ~553 GB/s
RTT-corrected, near the ~650 stream anchor. The engine's ablation budget:
~300 GB/s. Structural differences, one variant each (all scanned over
L=16 layers x outer repeats in one dispatch, RTT-subtracted):

  single    — one-window int8-codes attention, slim epilogue (baseline,
              should match bench_attention_variants xla_codes)
  fresh2    — EXACT _fresh_attention math: two parts [main S | fresh W],
              per-part len0/window keep masks, traced window scalar,
              slim epilogue (the engine's decode path)
  fresh2sw  — fresh2 with static window=0 (no traced-w mask term)
  freshcat  — two parts but K/V CONCATENATED up front into one (S+W)
              window (one dot per side instead of two)

Usage: python benchmarks/bench_attention_fresh.py [--B 128] [--S 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NEG_INF = -1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--KV", type=int, default=8)
    ap.add_argument("--r", type=int, default=4)
    ap.add_argument("--D", type=int, default=64)
    ap.add_argument("--S", type=int, default=256)
    ap.add_argument("--W", type=int, default=32)
    ap.add_argument("--L", type=int, default=16)
    ap.add_argument("--outer", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from llm_compressor_tpu.engine.generate import _i8_softmax_requant

    B, KV, r, D, S, W, L = (args.B, args.KV, args.r, args.D, args.S,
                            args.W, args.L)
    scale = D ** -0.5
    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8))
    vc = jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(.001, .02, (L, B, KV, 1, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(.001, .02, (L, B, KV, 1, S)).astype(np.float32))
    # round-5 FreshKV layout: codes (L, B, KV, W, D), step on sublanes
    kf = jnp.asarray(rng.integers(-127, 128, (L, B, KV, W, D)).astype(np.int8))
    vf = jnp.asarray(rng.integers(-127, 128, (L, B, KV, W, D)).astype(np.int8))
    ksf = jnp.asarray(rng.uniform(.001, .02, (L, B, KV, 1, W)).astype(np.float32))
    vsf = jnp.asarray(rng.uniform(.001, .02, (L, B, KV, 1, W)).astype(np.float32))
    len0 = jnp.full((B,), S - 2, jnp.int32)
    t = jnp.int32(W // 2)
    q0 = jnp.asarray(rng.normal(size=(B, KV, r, D)).astype(np.float32))

    def row_quant(x):
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s = jnp.maximum(absmax / 127.0, 1e-8)
        return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s

    dots = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    dotv = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    # round-5 fresh layout (W on sublanes): qk contracts dim 3, pv dim 2
    dots_f = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    dotv_f = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)

    def single(li, q, w, bufs):
        kc, vc, ks, vs, kf, vf, ksf, vsf = bufs
        qi, qs = row_quant(q)
        s = dots(qi, kc[li]).astype(jnp.float32) * qs * ks[li] * scale
        ids = jnp.arange(S)[None, :]
        keep = ids < len0[:, None]
        s = jnp.where(keep[:, None, None, :], s, NEG_INF)
        pis, osc = _i8_softmax_requant([s], [vs[li]], None)
        return dotv(pis[0], vc[li]).astype(jnp.float32) * osc

    def fresh2(li, q, w, bufs, static_w=False):
        kc, vc, ks, vs, kf, vf, ksf, vsf = bufs
        qi, qs = row_quant(q)
        s_m = dots(qi, kc[li]).astype(jnp.float32) * qs * ks[li] * scale
        s_f = dots_f(qi, kf[li]).astype(jnp.float32) * qs * ksf[li] * scale
        pos = len0 + t
        sm_ids = jnp.arange(S)[None, :]
        sf_ids = jnp.arange(W)[None, :]
        if static_w:
            keep_m = sm_ids < len0[:, None]
            keep_f = sf_ids <= t
        else:
            keep_m = (sm_ids < len0[:, None]) \
                & ((w <= 0) | (sm_ids > (pos - w)[:, None]))
            keep_f = (sf_ids <= t) \
                & ((w <= 0) | ((len0[:, None] + sf_ids) > (pos - w)[:, None]))
        s_m = jnp.where(keep_m[:, None, None, :], s_m, NEG_INF)
        s_f = jnp.where(keep_f[:, None, None, :], s_f, NEG_INF)
        pis, osc = _i8_softmax_requant([s_m, s_f], [vs[li], vsf[li]], None)
        o32 = dotv(pis[0], vc[li]) + dotv_f(pis[1], vf[li])
        return o32.astype(jnp.float32) * osc

    def fresh2_bf16(li, q, w, bufs):
        kc, vc, ks, vs, kf, vf, ksf, vsf = bufs
        """fresh2 with the integer dots run as BF16 MXU dots on the SAME
        code values — bitwise-exact (codes <= 127 exact in bf16; products
        <= 127^2 and f32 sums <= (S+W)*127^2 < 2^24 exact) but M=r=4 pads
        to 8 sublanes instead of int8's 32."""
        qi, qs = row_quant(q)
        qb = qi.astype(jnp.bfloat16)
        dots_b = lambda a, b: jax.lax.dot_general(
            a, b.astype(jnp.bfloat16),
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)
        dotv_b = lambda a, b: jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)
        dots_bf = lambda a, b: jax.lax.dot_general(
            a, b.astype(jnp.bfloat16),
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)
        dotv_bf = lambda a, b: jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)
        s_m = dots_b(qb, kc[li]) * qs * ks[li] * scale
        s_f = dots_bf(qb, kf[li]) * qs * ksf[li] * scale
        pos = len0 + t
        sm_ids = jnp.arange(S)[None, :]
        sf_ids = jnp.arange(W)[None, :]
        keep_m = (sm_ids < len0[:, None]) \
            & ((w <= 0) | (sm_ids > (pos - w)[:, None]))
        keep_f = (sf_ids <= t) \
            & ((w <= 0) | ((len0[:, None] + sf_ids) > (pos - w)[:, None]))
        s_m = jnp.where(keep_m[:, None, None, :], s_m, NEG_INF)
        s_f = jnp.where(keep_f[:, None, None, :], s_f, NEG_INF)
        pis, osc = _i8_softmax_requant([s_m, s_f], [vs[li], vsf[li]], None)
        o32 = dotv_b(pis[0], vc[li]) + dotv_bf(pis[1], vf[li])
        return o32 * osc

    def freshcat(li, q, w, bufs):
        kc, vc, ks, vs, kf, vf, ksf, vsf = bufs
        qi, qs = row_quant(q)
        kcat = jnp.concatenate([kc[li], jnp.swapaxes(kf[li], 2, 3)], axis=-1)
        vcat = jnp.concatenate([vc[li], jnp.swapaxes(vf[li], 2, 3)], axis=-1)
        kscat = jnp.concatenate([ks[li], ksf[li]], axis=-1)
        vscat = jnp.concatenate([vs[li], vsf[li]], axis=-1)
        s = dots(qi, kcat).astype(jnp.float32) * qs * kscat * scale
        ids = jnp.arange(S + W)[None, :]
        keep = jnp.where(ids < S, ids < len0[:, None], (ids - S) <= t)
        s = jnp.where(keep[:, None, None, :], s, NEG_INF)
        pis, osc = _i8_softmax_requant([s], [vscat], None)
        return dotv(pis[0], vcat).astype(jnp.float32) * osc

    from llm_compressor_tpu.kernels.decode_attention import decode_attention

    def pallas2(li, q, w, bufs):
        kc, vc, ks, vs, kf, vf, ksf, vsf = bufs
        return decode_attention(q, kc, vc, ks, vs, li, len0, len0 + t, w, t,
                                fresh=(kf, vf, ksf, vsf), scale=scale)

    def make_pallas_write_after():
        """TIMING-ONLY dataflow probe: kernel reads the CARRIED fresh
        buffers FIRST, the XLA DUS lane-write happens AFTER the read in
        the same layer (values stale at lane t — the real engine form
        would pass the current token as a width-1 third kernel part).
        Distinguishes read-after-write copy-protection (525 us/layer,
        pallas2_write) from write-after-read."""
        @jax.jit
        def run(q, w, bufs):
            kc, vc, ks, vs, kf, vf, ksf, vsf = bufs

            def outer(i, carry):
                q, kf, vf, ksf, vsf = carry

                def layer(c, li):
                    q, kf, vf, ksf, vsf = c
                    o = decode_attention(q, kc, vc, ks, vs, li, len0,
                                         len0 + t, w, t,
                                         fresh=(kf, vf, ksf, vsf),
                                         scale=scale)
                    # lane write AFTER the kernel read (chained through o
                    # so it cannot be hoisted above the read's consumer)
                    nk = jnp.clip(jnp.round(
                        o[:, :, :1, :] * 8), -127, 127
                    ).astype(jnp.int8)              # (B, KV, 1, D)
                    idx = (li, 0, 0, t, 0)          # sublane-slab write
                    kf = jax.lax.dynamic_update_slice(kf, nk[None], idx)
                    vf = jax.lax.dynamic_update_slice(vf, nk[None], idx)
                    q = (o / (1.0 + jnp.max(jnp.abs(o)))).astype(q.dtype)
                    return (q, kf, vf, ksf, vsf), None

                c, _ = jax.lax.scan(layer, carry, jnp.arange(L))
                return c

            q, *_ = jax.lax.fori_loop(0, args.outer, outer,
                                      (q, kf, vf, ksf, vsf))
            return q

        return lambda q, w: run(q, w, bufs0)

    def make_pallas_carry(write_lane: bool):
        """ENGINE-structured: fresh buffers as a scan CARRY, optionally a
        per-layer DUS write before the kernel reads them (the serving
        decode's exact dataflow) — detects XLA copy-protection of custom-
        call operands that are also updated in the loop."""
        @jax.jit
        def run(q, w, bufs):
            kc, vc, ks, vs, kf, vf, ksf, vsf = bufs

            def outer(i, carry):
                q, kf, vf, ksf, vsf = carry

                def layer(c, li):
                    q, kf, vf, ksf, vsf = c
                    if write_lane:
                        idx = (li, 0, 0, t, 0)      # sublane-slab write
                        kf = jax.lax.dynamic_update_slice(
                            kf, kf[:1, :, :, :1, :] ^ 1, idx)
                        vf = jax.lax.dynamic_update_slice(
                            vf, vf[:1, :, :, :1, :] ^ 1, idx)
                    o = decode_attention(q, kc, vc, ks, vs, li, len0,
                                         len0 + t, w, t,
                                         fresh=(kf, vf, ksf, vsf),
                                         scale=scale)
                    q = (o / (1.0 + jnp.max(jnp.abs(o)))).astype(q.dtype)
                    return (q, kf, vf, ksf, vsf), None

                c, _ = jax.lax.scan(layer, carry, jnp.arange(L))
                return c

            q, *_ = jax.lax.fori_loop(0, args.outer, outer,
                                      (q, kf, vf, ksf, vsf))
            return q

        return lambda q, w: run(q, w, bufs0)

    bufs0 = (kc, vc, ks, vs, kf, vf, ksf, vsf)

    def make(fn, **kw):
        # cache buffers ride as jit ARGS — closed-over device arrays embed
        # in the tunnel compile payload (HTTP 413 at these sizes, CLAUDE.md)
        @jax.jit
        def run(q, w, bufs):
            def outer(i, q):
                def layer(q, li):
                    o = fn(li, q, w, bufs, **kw)
                    return (o / (1.0 + jnp.max(jnp.abs(o)))).astype(q.dtype), None
                q, _ = jax.lax.scan(layer, q, jnp.arange(L))
                return q
            return jax.lax.fori_loop(0, args.outer, outer, q)

        return lambda q, w: run(q, w, bufs0)

    @jax.jit
    def tiny(x):
        return x * 1.0000001 + 1.0

    z = jnp.arange(1024, dtype=jnp.float32)
    jax.device_get(tiny(z)[:4])
    rtts = []
    for i in range(5):
        z2 = z + float(i)
        jax.device_get(z2[:4])
        t0 = time.perf_counter()
        jax.device_get(tiny(z2)[:4])
        rtts.append((time.perf_counter() - t0) * 1e3)
    rtt = min(rtts)
    print(f"rtt {rtt:.1f} ms", flush=True)

    only = os.environ.get("ATTN_FRESH_ONLY", "")
    variants = {"single": make(single), "fresh2": make(fresh2),
                "fresh2sw": make(fresh2, static_w=True),
                "fresh2bf16": make(fresh2_bf16),
                "freshcat": make(freshcat),
                "pallas2": make(pallas2),
                "pallas2_carry": make_pallas_carry(False),
                "pallas2_write": make_pallas_carry(True),
                # pallas3_update (round-4 aliased fresh_write probe) was
                # dropped when FreshKV moved to the (L, B, KV, W, D)
                # layout: fresh_write still operates on the old
                # lane-sequence buffers and cannot feed decode_attention
                # any more. Its recorded number (174-223 us/layer,
                # docs/serving.md round-4 table) motivated the round-5
                # fused-append kernel that replaced the approach.
                "pallas4_wafter": make_pallas_write_after()}
    if only:
        keep = only.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}
    nb = args.outer * L * (2 * B * KV * D * (S + W) + 2 * B * KV * (S + W) * 4)
    w0 = jnp.int32(0)
    out = {"rtt_ms": round(rtt, 1)}
    for name, fn in variants.items():
        jax.device_get(fn(q0, w0)[:1, :1, :1, :1])
        print(f"compiled {name}", flush=True)
    for rnd in range(3):
        for name, fn in variants.items():
            qf = q0 + 0.01 * rnd + 0.001
            jax.device_get(qf[:1, :1, :1, :1])
            t0 = time.perf_counter()
            jax.device_get(fn(qf, w0)[:1, :1, :1, :1])
            dt = (time.perf_counter() - t0) * 1e3 - rtt
            us_layer = dt * 1e3 / (args.outer * L)
            gbs = nb / (dt / 1e3) / 1e9
            prev = out.get(name)
            out[name] = round(min(dt, prev) if prev else dt, 1)
            print(f"round {rnd} {name:9s} {dt:7.1f} ms  {us_layer:6.1f} "
                  f"us/layer ({gbs:5.0f} GB/s)", flush=True)
    out["note"] = "bytes include fresh W lanes for all variants"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
