"""W4A8 kernel formulation shootout on the real chip.

Variants (all compute y = sx * sum_g s[n,g] * (x_i8_g . w_i4_g)):
  A  current kernel (int32 mask/sub unpack)                [baseline]
  B  uint8-domain unpack (mask/shift in 8-bit, int8 sub)
  G  biased-dot: dot with unsigned nibbles + 8*sum(x_g) correction
     (zero per-element unpack arithmetic beyond one mask / one shift)
  D  int8 storage (pre-unpacked in HBM, 2x bytes), per-group dots
  F  pure-XLA grouped int8 einsum (no pallas)
plus bf16 dot and pallas no-op for overhead calibration.

Run: python benchmarks/bench_w4a8_variants.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _cdiv(a, b):
    return -(-a // b)


def timeit(name, fn, argsets, steps=64, warmup=8):
    for i in range(warmup):
        out = fn(*argsets[i % len(argsets)])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(steps):
        out = fn(*argsets[i % len(argsets)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / steps
    print(f"  {name:44s} {dt*1e6:9.1f} us")
    return dt


# --- kernels ----------------------------------------------------------------

def kern_A(x_ref, wp_ref, s_ref, out_ref, acc, *, group, n_groups):
    acc[...] = jnp.zeros_like(acc)
    half = group // 2
    wpv = wp_ref[...].astype(jnp.int32)
    lo_all = ((wpv & 0xF) - 8).astype(jnp.int8)
    hi_all = ((wpv >> 4) - 8).astype(jnp.int8)
    for g in range(n_groups):
        xlo = x_ref[:, g * group: g * group + half]
        xhi = x_ref[:, g * group + half: (g + 1) * group]
        part = jax.lax.dot_general(xlo, lo_all[:, g * half:(g + 1) * half],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        part += jax.lax.dot_general(xhi, hi_all[:, g * half:(g + 1) * half],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        acc[...] += part.astype(jnp.float32) * s_ref[:, g][None, :]
    out_ref[...] = acc[...]


def kern_B(x_ref, wp_ref, s_ref, out_ref, acc, *, group, n_groups):
    acc[...] = jnp.zeros_like(acc)
    half = group // 2
    wp = wp_ref[...]
    lo_all = (wp & jnp.uint8(0xF)).astype(jnp.int8) - jnp.int8(8)
    hi_all = (wp >> 4).astype(jnp.int8) - jnp.int8(8)
    for g in range(n_groups):
        xlo = x_ref[:, g * group: g * group + half]
        xhi = x_ref[:, g * group + half: (g + 1) * group]
        part = jax.lax.dot_general(xlo, lo_all[:, g * half:(g + 1) * half],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        part += jax.lax.dot_general(xhi, hi_all[:, g * half:(g + 1) * half],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        acc[...] += part.astype(jnp.float32) * s_ref[:, g][None, :]
    out_ref[...] = acc[...]


def kern_G(x_ref, wp_ref, s_ref, xs_ref, out_ref, acc, *, group, n_groups):
    # biased-dot: w stored as (q+8) nibbles; dot with the biased values and
    # subtract 8*sum(x_g) afterwards (xs precomputed outside, (TM, G) f32).
    acc[...] = jnp.zeros_like(acc)
    half = group // 2
    wp = wp_ref[...]
    lo_all = (wp & jnp.uint8(0xF)).astype(jnp.int8)
    hi_all = (wp >> 4).astype(jnp.int8)
    for g in range(n_groups):
        xlo = x_ref[:, g * group: g * group + half]
        xhi = x_ref[:, g * group + half: (g + 1) * group]
        part = jax.lax.dot_general(xlo, lo_all[:, g * half:(g + 1) * half],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        part += jax.lax.dot_general(xhi, hi_all[:, g * half:(g + 1) * half],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        acc[...] += (part.astype(jnp.float32) - xs_ref[:, g][:, None]) * s_ref[:, g][None, :]
    out_ref[...] = acc[...]


def kern_D(x_ref, w_ref, s_ref, out_ref, acc, *, group, n_groups):
    acc[...] = jnp.zeros_like(acc)
    for g in range(n_groups):
        xg = x_ref[:, g * group:(g + 1) * group]
        wg = w_ref[:, g * group:(g + 1) * group]
        part = jax.lax.dot_general(xg, wg, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        acc[...] += part.astype(jnp.float32) * s_ref[:, g][None, :]
    out_ref[...] = acc[...]


def kern_noop(x_ref, out_ref):
    out_ref[...] = x_ref[...].astype(jnp.float32)


def make_call(kern, nin, M, N, C, group, tn, extra_shapes=()):
    n_groups = C // group
    packed = kern in (kern_A, kern_B, kern_G)
    wcols = C // 2 if packed else C

    @jax.jit
    def call(x_i8, wp, scales, *extras):
        in_specs = [
            pl.BlockSpec((M, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, wcols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, n_groups), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        for es in extra_shapes:
            in_specs.append(pl.BlockSpec(es, lambda i: (0, 0), memory_space=pltpu.VMEM))
        return pl.pallas_call(
            partial(kern, group=group, n_groups=n_groups),
            grid=(_cdiv(N, tn),),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((M, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
            cost_estimate=pl.CostEstimate(flops=2 * M * N * C,
                                          bytes_accessed=N * wcols + M * C + M * N * 4,
                                          transcendentals=0),
        )(x_i8, wp, scales, *extras)

    return call


def xla_grouped(x_i8, wb, s_t, xs):
    # wb: (G, N, group) biased int8; x arranged (G, M, group); parts batched dot
    G, M, group = x_i8.shape
    parts = jax.lax.dot_general(x_i8, wb, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)  # (G, M, N)
    y = jnp.einsum("gmn,gn->mn", parts.astype(jnp.float32) - xs.T[:, :, None], s_t)
    return y


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    M, group = 32, 128

    for (N, C, tag) in [(8192, 2048, "gate/up"), (2048, 8192, "down"),
                        (3072, 2048, "qkv-fused")]:
        G = C // group
        print(f"shape ({M}x{C}) @ ({N}x{C})^T  [{tag}]  G={G}")
        # 4 distinct activation buffers to dodge any dispatch dedup
        xs_bufs = [jnp.asarray(rng.integers(-127, 128, (M, C)), jnp.int8)
                   for _ in range(4)]
        q4 = rng.integers(-8, 8, (N, C)).astype(np.int8)
        biased = (q4 + 8).astype(np.uint8)
        lo, hi = [], []
        for g in range(G):
            blk = biased[:, g * group:(g + 1) * group]
            lo.append(blk[:, :group // 2])
            hi.append(blk[:, group // 2:])
        wp = jnp.asarray(np.concatenate(
            [l | (h << 4) for l, h in zip(lo, hi)], axis=1))  # (N, C/2) uint8
        w8 = jnp.asarray(q4)                                   # (N, C) int8
        scales = jnp.asarray(rng.uniform(0.01, 0.02, (N, G)), jnp.float32)

        wbf16 = jnp.asarray(q4, jnp.bfloat16)
        xbf = [x.astype(jnp.bfloat16) for x in xs_bufs]
        bf16_dot = jax.jit(lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ()))))
        timeit("bf16 dot", bf16_dot, [(x, wbf16) for x in xbf])

        tn = 1024 if N % 1024 == 0 else 512
        callA = make_call(kern_A, 3, M, N, C, group, tn)
        callD = make_call(kern_D, 3, M, N, C, group, tn)

        xsum = [8.0 * jnp.sum(x.reshape(M, G, group).astype(jnp.int32),
                              axis=2).astype(jnp.float32) for x in xs_bufs]

        timeit("A  int32 mask/sub unpack (current)", callA,
               [(x, wp, scales) for x in xs_bufs])
        # B (uint8-domain unpack with int8 subtract) and G (uint8 shifts)
        # fail to compile: arith.subi / arith.shrui on vector<...xi8> are
        # unimplemented in this Mosaic. 8-bit elementwise arithmetic is
        # int32-domain only.
        timeit("D  int8 storage (2x bytes)", callD,
               [(x, w8, scales) for x in xs_bufs])

        # F: pure XLA batched-group dot (biased weights pre-arranged (G,N,g))
        wb_g = jnp.asarray(np.stack([biased[:, g * group:(g + 1) * group]
                                     for g in range(G)]).astype(np.int8))
        s_t = scales.T.reshape(G, N)
        xg = [x.reshape(M, G, group).transpose(1, 0, 2) for x in xs_bufs]
        timeit("F  pure-XLA grouped batched dot", jax.jit(xla_grouped),
               [(x, wb_g, s_t, xs) for x, xs in zip(xg, xsum)])

        # overhead: no-op pallas call on the activation
        @jax.jit
        def noop(x):
            return pl.pallas_call(
                kern_noop,
                out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        timeit("pallas no-op (fixed overhead)", noop, [(x,) for x in xs_bufs])

        # correctness spot-check
        ra = callA(xs_bufs[0], wp, scales)
        rd = callD(xs_bufs[0], w8, scales)
        err_d = float(jnp.max(jnp.abs(ra - rd)))
        print(f"  max|A-D| = {err_d:.3e}")

        # production wrapper decomposition (same shape)
        from llm_compressor_tpu.kernels.w4a8_matmul import (
            quantize_acts_per_token, w4a8_matmul)
        from llm_compressor_tpu.qformats.config import parse_qspec
        from llm_compressor_tpu.qformats.qtensor import quantize_pack
        wreal = jnp.asarray(rng.standard_normal((N, C)) * 0.02, jnp.bfloat16)
        qt = quantize_pack(parse_qspec("int4-g[128]-rw"), wreal)
        xb_bufs = [x.astype(jnp.bfloat16) for x in xs_bufs]
        timeit("PROD w4a8_matmul (wrapper incl act-q)", jax.jit(w4a8_matmul),
               [(x, qt) for x in xb_bufs])
        timeit("PROD act quant alone", jax.jit(quantize_acts_per_token),
               [(x,) for x in xb_bufs])

    # HBM bandwidth sanity: copy 256 MB
    big = jnp.asarray(rng.standard_normal((128, 1024, 1024)), jnp.bfloat16)
    t = timeit("copy 256MB (read+write 512MB)", jax.jit(lambda x: x + 1), [(big,)],
               steps=16)
    print(f"  effective HBM BW ~ {2 * big.size * 2 / t / 1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
