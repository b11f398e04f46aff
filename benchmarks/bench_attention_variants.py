"""Isolated decode-attention A/B at the flagship's decode shapes.

Variants (each scanned over L layers like the serving decode step):
  xla_dequant — current XLA fallback: dequantize the int8 window to bf16,
                bf16 einsums with f32 scores (engine/generate.py)
  xla_codes   — int8 x int8 dot_generals DIRECTLY on the stored codes
                (the kernel's quant_acts math, but in XLA: no Pallas launch,
                scale multiplies fused into elementwise epilogues)
  pallas      — kernels/decode_attention.py (quant_acts=True)

All variants measured interleaved on fresh values (tunnel-cache rules,
CLAUDE.md). Work per timed call = OUTER repeats of the L-layer scan.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--KV", type=int, default=8)
    ap.add_argument("--r", type=int, default=4)
    ap.add_argument("--D", type=int, default=64)
    ap.add_argument("--S", type=int, default=256)
    ap.add_argument("--L", type=int, default=16)
    ap.add_argument("--outer", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import pallas_decode_attention as da  # benchmarks/ (removed from the
    # serving path after losing its A/B twice — VERDICT r2 item 2)

    B, KV, r, D, S, L = args.B, args.KV, args.r, args.D, args.S, args.L
    scale = D ** -0.5

    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8))
    vc = jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (L, B, KV, 1, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (L, B, KV, 1, S)).astype(np.float32))
    lengths = jnp.full((B,), S - 2, jnp.int32)
    q0 = jnp.asarray(rng.normal(size=(B, KV, r, D)).astype(np.float32))

    def row_quant(x):
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s = jnp.maximum(absmax / 127.0, 1e-8)
        return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s

    def mask_scores(s):  # (B, KV, r, S)
        ids = jnp.arange(S)[None, None, None, :]
        return jnp.where(ids <= lengths[:, None, None, None], s, -1e9)

    def attn_xla_dequant(li, q, kc, vc, ks, vs):
        K = (kc[li].astype(jnp.float32) * ks[li]).astype(jnp.bfloat16)
        V = (vc[li].astype(jnp.float32) * vs[li]).astype(jnp.bfloat16)
        s = jnp.einsum("bkrd,bkds->bkrs", q.astype(jnp.bfloat16), K,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(mask_scores(s), axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bkrs,bkds->bkrd", p, V,
                          preferred_element_type=jnp.float32)

    def attn_xla_codes(li, q, kc, vc, ks, vs):
        qi, qs = row_quant(q)
        s32 = jax.lax.dot_general(  # (B, KV, r, D) . (B, KV, D, S) int8 MXU
            qi, kc[li], dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qs * ks[li][:, :, :, :] * scale
        p = jax.nn.softmax(mask_scores(s), axis=-1)
        pv = p * vs[li]
        pi, ps = row_quant(pv)
        o32 = jax.lax.dot_general(  # (B, KV, r, S) . (B, KV, D, S)
            pi, vc[li], dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)
        return o32.astype(jnp.float32) * ps

    def attn_pallas(li, q, kc, vc, ks, vs):
        return da.decode_attention(q, kc, vc, ks, vs, li, lengths, 0,
                                   scale=scale, quant_acts=True,
                                   out_dtype=jnp.float32)

    # variant: one program per SLOT (grid (B,), block (KV, D, S)) — tests
    # whether the (B, KV)=256-program grid's per-program overhead dominates
    from functools import partial as _p
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kern_b(layer_ref, lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                o_ref):
        b = pl.program_id(0)
        q = q_ref[0].astype(jnp.float32)              # (KV, r, D)
        k = k_ref[0, 0]                               # (KV, D, S) int8
        v = v_ref[0, 0]
        kss = ks_ref[0, 0]                            # (KV, 1, S)
        vss = vs_ref[0, 0]
        qi, qs = row_quant(q)
        s32 = jax.lax.dot_general(
            qi, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)         # (KV, r, S)
        s = s32.astype(jnp.float32) * qs * kss * scale
        ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(ids <= lens_ref[b], s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        pv = p * vss
        pi, ps = row_quant(pv)
        o32 = jax.lax.dot_general(
            pi, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)         # (KV, r, D)
        o_ref[0] = o32.astype(jnp.float32) * ps

    def attn_pallas_b(li, q, kc, vc, ks, vs):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[
                pl.BlockSpec((1, KV, r, D), lambda b, l, le: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, KV, D, S),
                             lambda b, l, le: (l[0], b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, KV, D, S),
                             lambda b, l, le: (l[0], b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, KV, 1, S),
                             lambda b, l, le: (l[0], b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, KV, 1, S),
                             lambda b, l, le: (l[0], b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, KV, r, D), lambda b, l, le: (b, 0, 0, 0)),
        )
        return pl.pallas_call(
            _kern_b, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((B, KV, r, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=jax.default_backend() != "tpu",
        )(jnp.asarray([li], jnp.int32).ravel(), lengths, q, kc, vc, ks, vs)

    # variant: V stored TRANSPOSED (L, B, KV, S, D). The PV dot then
    # contracts p's lane dim against V's SUBLANE dim — the canonical
    # (r, S) . (S, D) MXU form — instead of lane-vs-lane (which the cache
    # docstring asserts is transpose-free; this measures that claim).
    vt = jnp.transpose(vc, (0, 1, 2, 4, 3)).copy()     # (L, B, KV, S, D)

    def attn_xla_codes_vt(li, q, kc, vc, ks, vs):
        # here ``vc`` is the TRANSPOSED buffer (L, B, KV, S, D)
        qi, qs = row_quant(q)
        s32 = jax.lax.dot_general(
            qi, kc[li], dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qs * ks[li][:, :, :, :] * scale
        p = jax.nn.softmax(mask_scores(s), axis=-1)
        pv = p * vs[li]
        pi, ps = row_quant(pv)
        o32 = jax.lax.dot_general(  # (B, KV, r, S) . (B, KV, S, D)
            pi, vc[li], dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)
        return (o32.astype(jnp.float32) * ps).reshape(B, KV, r, D)

    def make(fn, vbuf=vc):
        # cache arrays ride as jit ARGS (closed-over device arrays embed in
        # the tunnel compile payload -> HTTP 413 at S=2048; CLAUDE.md) —
        # ``vbuf`` lets the transposed-V variant stream its own layout
        @jax.jit
        def run(q, kc, vc, ks, vs):
            def outer(i, q):
                def layer(q, li):
                    o = fn(li, q, kc, vc, ks, vs)
                    # feed output forward so every iteration computes on
                    # fresh values (no tunnel-cache-able repeats)
                    return (o / (1.0 + jnp.max(jnp.abs(o)))).astype(q.dtype), None
                q, _ = jax.lax.scan(layer, q, jnp.arange(L))
                return q
            return jax.lax.fori_loop(0, args.outer, outer, q)
        return lambda q: run(q, kc, vbuf, ks, vs)

    variants = {"xla_dequant": make(attn_xla_dequant),
                "xla_codes": make(attn_xla_codes),
                "xla_codes_vt": make(attn_xla_codes_vt, vbuf=vt),
                "pallas": make(attn_pallas),
                "pallas_b": make(attn_pallas_b)}
    gb = args.outer * L * (2 * B * KV * D * S + 2 * B * KV * S * 4) / 1e9

    # numeric sanity: codes and pallas must match closely (jitted — eager
    # op-by-op dispatch would mini-compile every op over the tunnel)
    @jax.jit
    def _parity(q, kc, vc, ks, vs):
        a = attn_xla_codes(0, q, kc, vc, ks, vs)
        b = attn_pallas(0, q, kc, vc, ks, vs)
        return jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9)

    print(f"codes-vs-pallas rel err: "
          f"{float(_parity(q0, kc, vc, ks, vs)):.2e}", flush=True)

    @jax.jit
    def _parity_vt(q, kc, vc, vt, ks, vs):
        a = attn_xla_codes(0, q, kc, vc, ks, vs)
        b = attn_xla_codes_vt(0, q, kc, vt, ks, vs)
        return jnp.max(jnp.abs(a - b))

    print(f"codes-vs-vt abs err: "
          f"{float(_parity_vt(q0, kc, vc, vt, ks, vs)):.2e}", flush=True)

    for name, fn in variants.items():
        jax.device_get(fn(q0)[:1, :1, :1, :1])
        print(f"compiled {name}", flush=True)
    for rnd in range(3):
        out = []
        for name, fn in variants.items():
            qf = q0 + 0.01 * rnd + 0.001
            jax.device_get(qf[:1, :1, :1, :1])
            t0 = time.perf_counter()
            jax.device_get(fn(qf)[:1, :1, :1, :1])
            dt = time.perf_counter() - t0
            out.append(f"{name}: {dt*1e3:7.1f} ms ({gb/dt:6.1f} GB/s)")
        print(f"round {rnd}:  " + "   ".join(out), flush=True)


if __name__ == "__main__":
    main()
