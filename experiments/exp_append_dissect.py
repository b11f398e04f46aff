"""Dissect the fused-append kernel's in-engine loss (round 5).

exp_attn_append.py measured the append-kernel serving path at +4.45
ms/step (+278 us/layer) vs the XLA two-part path — far above the
read-only kernel's 77 us/layer. Standalone variants, same run, all
L-layer scan x outer repeats in ONE dispatch (value-chained through q,
RTT-subtracted):

  xla2        — engine XLA two-part path, round-5 fresh layout
  readonly_k  — round-4 read-only two-part kernel (77 us/layer baseline)
  append_k    — fused-append kernel, fresh invariant + ys collected
                (the engine structure)
  append_noys — fused-append kernel, fresh outputs DISCARDED (only o is
                consumed) — isolates the ys-stacking cost
  append_nofr — fused-append kernel consuming ys INSIDE the layer scan
                carry-free... (variant: ys fed to next outer iteration)

Run: python experiments/exp_append_dissect.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NEG_INF = -1e9


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    assert jax.default_backend() == "tpu"

    from llm_compressor_tpu.engine.generate import _i8_softmax_requant
    from llm_compressor_tpu.kernels.decode_attention import (
        decode_attention,
        decode_attention_append,
    )

    B, KV, r, D, S, W, L, outer = 128, 8, 4, 64, 256, 32, 16, 32
    scale = D ** -0.5
    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8))
    vc = jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(.001, .02, (L, B, KV, 1, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(.001, .02, (L, B, KV, 1, S)).astype(np.float32))
    # round-5 fresh layout: codes (L, B, KV, W, D)
    kf = jnp.asarray(rng.integers(-127, 128, (L, B, KV, W, D)).astype(np.int8))
    vf = jnp.asarray(rng.integers(-127, 128, (L, B, KV, W, D)).astype(np.int8))
    ksf = jnp.asarray(rng.uniform(.001, .02, (L, B, KV, 1, W)).astype(np.float32))
    vsf = jnp.asarray(rng.uniform(.001, .02, (L, B, KV, 1, W)).astype(np.float32))
    len0 = jnp.full((B,), S - 2, jnp.int32)
    t = jnp.int32(W // 2)
    q0 = jnp.asarray(rng.normal(size=(B, KV, r, D)).astype(np.float32))
    bufs0 = (kc, vc, ks, vs, kf, vf, ksf, vsf)

    class Cache:
        pass

    def mk_cache(bufs):
        c = Cache()
        c.k, c.v, c.k_scale, c.v_scale = bufs[:4]
        return c

    def mk_fresh(bufs):
        f = Cache()
        f.k, f.v, f.k_scale, f.v_scale = bufs[4:]
        return f

    def row_quant(x):
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s = jnp.maximum(absmax / 127.0, 1e-8)
        return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s

    def new_kv_from(q):
        nk = jnp.clip(jnp.round(jnp.swapaxes(q[:, :, :1, :], 2, 3) * 8),
                      -127, 127).astype(jnp.int8)        # (B, KV, D, 1)
        nks = jnp.abs(q[:, :, :1, :1]) * .01 + 1e-4      # (B, KV, 1, 1)
        return (nk, nk, nks, nks)

    dots = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    dots_f = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    dotv = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    dotv_f = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)

    def xla2_layer(li, q, w, bufs):
        kc, vc, ks, vs, kf, vf, ksf, vsf = bufs
        qi, qs = row_quant(q)
        s_m = dots(qi, kc[li]).astype(jnp.float32) * qs * ks[li] * scale
        s_f = dots_f(qi, kf[li]).astype(jnp.float32) * qs * ksf[li] * scale
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
        o32 = dotv(pis[0], vc[li]) + dotv_f(pis[1], vf[li])
        return o32.astype(jnp.float32) * osc

    def make_xla2():
        @jax.jit
        def run(q, w, bufs):
            def outer_body(i, q):
                def layer(q, li):
                    o = xla2_layer(li, q, w, bufs)
                    return (o / (1.0 + jnp.max(jnp.abs(o)))).astype(q.dtype), None
                q, _ = jax.lax.scan(layer, q, jnp.arange(L))
                return q
            return jax.lax.fori_loop(0, outer, outer_body, q)
        return lambda q, w: run(q, w, bufs0)

    def make_readonly_k():
        @jax.jit
        def run(q, w, bufs):
            kc, vc, ks, vs, kf, vf, ksf, vsf = bufs

            def outer_body(i, q):
                def layer(q, li):
                    o = decode_attention(q, kc, vc, ks, vs, li, len0,
                                         len0 + t, w, t,
                                         fresh=(kf, vf, ksf, vsf),
                                         scale=scale)
                    return (o / (1.0 + jnp.max(jnp.abs(o)))).astype(q.dtype), None
                q, _ = jax.lax.scan(layer, q, jnp.arange(L))
                return q
            return jax.lax.fori_loop(0, outer, outer_body, q)
        return lambda q, w: run(q, w, bufs0)

    def make_append_o_only():
        """emit_fresh=False: the kernel does the merge + attention but
        writes ONLY o — isolates the 4 fresh outputs' cost (the engine
        cannot use this form standalone; the deferred-write engine form
        loses to per-call copy-protection, exp_append_defer.py)."""
        @jax.jit
        def run(q, w, bufs):
            cache = mk_cache(bufs)
            fr = mk_fresh(bufs)

            def outer_body(i, q):
                def layer(q, li):
                    qi, qs = row_quant(q)
                    o, _ = decode_attention_append(
                        qi, qs, cache, fr, new_kv_from(q), li, len0,
                        len0 + t, w, t, scale=scale, emit_fresh=False)
                    return (o / (1.0 + jnp.max(jnp.abs(o)))).astype(q.dtype), None
                q, _ = jax.lax.scan(layer, q, jnp.arange(L))
                return q
            return jax.lax.fori_loop(0, outer, outer_body, q)
        return lambda q, w: run(q, w, bufs0)

    def make_append(consume_ys: bool):
        @jax.jit
        def run(q, w, bufs):
            cache = mk_cache(bufs)

            def outer_body(i, carry):
                q, fk, fv, fks, fvs = carry
                fr = Cache()
                fr.k, fr.v, fr.k_scale, fr.v_scale = fk, fv, fks, fvs

                def layer(q, li):
                    qi, qs = row_quant(q)
                    o, sl = decode_attention_append(
                        qi, qs, cache, fr, new_kv_from(q), li, len0,
                        len0 + t, w, t, scale=scale)
                    return (o / (1.0 + jnp.max(jnp.abs(o)))).astype(q.dtype), sl

                q, ys = jax.lax.scan(layer, q, jnp.arange(L))
                if consume_ys:
                    return (q, *ys)
                # depend on ys only through a cheap max so the stacking
                # write still happens but isn't fed back
                return (q + 0 * jnp.max(ys[3][..., :1, :1].sum()),
                        fk, fv, fks, fvs)

            c = jax.lax.fori_loop(0, outer, outer_body,
                                  (q, kf, vf, ksf, vsf))
            return c[0]
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

    variants = {
        "xla2": make_xla2(),
        "readonly_k": make_readonly_k(),
        "append_ys": make_append(True),
        "append_noys": make_append(False),
        "append_o_only": make_append_o_only(),
    }
    only = os.environ.get("APPEND_ONLY", "")
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only.split(",")}
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
            us_layer = dt * 1e3 / (outer * L)
            prev = out.get(name)
            out[name] = round(min(dt, prev) if prev else dt, 1)
            print(f"round {rnd} {name:12s} {dt:7.1f} ms  {us_layer:6.1f} us/layer",
                  flush=True)
    out["us_per_layer"] = {k: round(v * 1e3 / (outer * L), 1)
                           for k, v in out.items() if k != "rtt_ms"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
