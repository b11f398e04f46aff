"""Dissect the W4A8 kernel's time budget with controlled Pallas variants.

Question: the grouped int8 kernel runs at ~150-210 GB/s(packed) while XLA
bf16 matmuls stream 500-650 GB/s on the same shapes. Which part is the
bottleneck — DMA, the gpk small K=g MXU dots, the per-group f32
scale-FMA, or the int4 nibble unpack?

Variants per shape (same in-graph scan harness as bench_w4a8_ingraph —
value-chained through a global max, fresh inputs per timed dispatch):
  kernel     — the real w4a8_matmul (grouped dots + f32 scale-accum)
  dequant    — kernels/dequant_matmul (in-kernel dequant to bf16, big dots)
  bf16       — XLA dot on bf16 weights (DMA anchor at 2x/4x the bytes)
  dot1       — Pallas: ONE K=tk int8 dot per k-step, no scales (numerics
               wrong on purpose: int8-MXU + DMA upper bound)
  gdots      — Pallas: gpk K=g int8 dots, int32 local accum, convert once
               (adds small-dot cost, still no per-group scale work)
  gscale     — gdots + per-group f32 convert+scale-FMA (the real kernel's
               inner loop, minus the int4 unpack)  [int8 shapes only]

int4 shapes additionally:
  unpack1    — whole-tile nibble unpack + ONE K=tk dot on the lo plane and
               one on the hi plane concatenated? No — unpack + gpk dots is
               'kernel'; unpack + single dot over the unpacked tile (wrong
               numerics, measures unpack + big-dot).
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul, _round_up
    from llm_compressor_tpu.kernels.dequant_matmul import dequant_matmul
    from llm_compressor_tpu.qformats import build_quant_config, quantize_pack

    M = args.M
    GROUP = 128
    SHAPES = [  # (name, C, N, fmt, iters)
        ("qkv", 2048, 3072, "int4", 16384),
        ("head8k", 2048, 8192, "int8", 2048),
    ]
    rng = np.random.default_rng(0)

    # ---------------- probe kernels ----------------
    def probe_kernel(x_ref, wp_ref, out_ref, acc, *, mode, group, tk, nk):
        k = pl.program_id(2)
        gpk = tk // group
        if mode == "dot1":
            total = jax.lax.dot_general(
                x_ref[...], wp_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        elif mode in ("gdots", "gscale"):
            total = None
            for gi in range(gpk):
                part = jax.lax.dot_general(
                    x_ref[:, gi * group:(gi + 1) * group],
                    wp_ref[:, gi * group:(gi + 1) * group],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if mode == "gscale":
                    part = part.astype(jnp.float32) * (0.01 + gi * 1e-4)
                total = part if total is None else total + part
        elif mode == "unpack1":
            wp = wp_ref[...].astype(jnp.int32)
            lo = ((wp & 0xF) - 8).astype(jnp.int8)
            hi = ((wp >> 4) - 8).astype(jnp.int8)
            w = jnp.concatenate([lo, hi], axis=1)   # (TN, tk) wrong order, ok
            total = jax.lax.dot_general(
                x_ref[...], w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        @pl.when(k == 0)
        def _():
            acc[...] = total.astype(jnp.float32) if total.dtype != jnp.float32 else total

        @pl.when(k > 0)
        def _():
            acc[...] += total.astype(jnp.float32) if total.dtype != jnp.float32 else total

        @pl.when(k == nk - 1)
        def _():
            out_ref[...] = acc[...].astype(out_ref.dtype)

    def make_probe(mode, qt, C, N, int4, iters):
        tk = 2048
        nk = C // tk if C >= tk else 1
        tk = C // nk
        tm = min(_round_up(M, 32), 256)
        tn = 1024 if N >= 1024 else 512
        wp = (qt.codes.reshape(N, C // 2) if int4 else qt.codes.reshape(N, C))
        wtk = tk // 2 if int4 else tk

        def call(x_i8, wp):
            return pl.pallas_call(
                partial(probe_kernel, mode=mode, group=GROUP, tk=tk, nk=nk),
                grid=(-(-M // tm), -(-N // tn), nk),
                in_specs=[
                    pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, wtk), lambda i, j, k: (j, k),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((_round_up(M, tm), N),
                                               jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")),
            )(x_i8, wp)

        @jax.jit
        def run(x0, wp):
            def step(x, _):
                xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 64),
                              -127, 127).astype(jnp.int8)
                y = call(xi, wp)
                m = jnp.max(y.astype(jnp.float32))
                xn = (x.astype(jnp.float32) * 0.999
                      + 0.001 * m / (1.0 + jnp.abs(m))).astype(jnp.bfloat16)
                return xn, None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x

        return lambda x0: run(x0, wp)

    def chain(x, y):
        m = jnp.max(y.astype(jnp.float32))
        return (x.astype(jnp.float32) * 0.999
                + 0.001 * m / (1.0 + jnp.abs(m))).astype(jnp.bfloat16)

    def make_real(fn, arg, iters):
        @jax.jit
        def run(x0, arg):
            def step(x, _):
                return chain(x, fn(x, arg)), None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x
        return lambda x0: run(x0, arg)

    runs = []
    for name, C, N, fmt, iters in SHAPES:
        int4 = fmt == "int4"
        q = build_quant_config(f"{fmt}-g[{GROUP}]-rw", None, None, None)
        W = rng.normal(size=(N, C)).astype(np.float32) * 0.02
        qt = quantize_pack(q.linear.weight, jnp.asarray(W))
        Wd = jnp.asarray(W, jnp.bfloat16)
        x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)
        pbytes = qt.codes.size * qt.codes.dtype.itemsize + qt.scales.nbytes

        runs.append((f"{name}/kernel", make_real(
            lambda x, qt: w4a8_matmul(x, qt), qt, iters), x0, pbytes, iters))
        runs.append((f"{name}/dequant", make_real(
            lambda x, qt: dequant_matmul(x, qt), qt, iters), x0, pbytes, iters))
        runs.append((f"{name}/bf16", make_real(
            lambda x, W: jnp.dot(x, W.T, preferred_element_type=jnp.float32),
            Wd, iters), x0, Wd.nbytes, iters))
        if int4:
            # dot1/gdots need unpacked operands; the unpack probe isolates
            # nibble-unpack + one big dot (wrong numerics, right bytes)
            runs.append((f"{name}/unpack1",
                         make_probe("unpack1", qt, C, N, int4, iters),
                         x0, pbytes, iters))
        else:
            runs.append((f"{name}/dot1",
                         make_probe("dot1", qt, C, N, int4, iters),
                         x0, pbytes, iters))
            runs.append((f"{name}/gdots",
                         make_probe("gdots", qt, C, N, int4, iters),
                         x0, pbytes, iters))
            runs.append((f"{name}/gscale",
                         make_probe("gscale", qt, C, N, int4, iters),
                         x0, pbytes, iters))

    for name, fn, x0, _, _ in runs:
        t0 = time.perf_counter()
        jax.device_get(fn(x0)[:1, :1])
        print(f"compiled {name} [{time.perf_counter()-t0:.0f}s]", flush=True)

    for rnd in range(3):
        print(f"--- round {rnd}", flush=True)
        for name, fn, x0, pbytes, iters in runs:
            xf = x0 + 0.01 * (rnd + 1)
            jax.device_get(xf[:1, :1])
            t0 = time.perf_counter()
            jax.device_get(fn(xf)[:1, :1])
            dt = time.perf_counter() - t0
            per = dt / iters * 1e6
            gbs = pbytes * iters / dt / 1e9
            print(f"  {name:18s} {per:9.1f} us/call  {gbs:7.1f} GB/s(w)"
                  f"  [{dt*1e3:6.0f} ms total]", flush=True)


if __name__ == "__main__":
    main()
