"""Round 2: pin the real-kernel vs probe gap (exp_kernel_dissect found the
grouped dots + scale FMA are free — gscale 41.6us == dot1 40.3us — but the
real kernel costs 59.7us on head8k and 22.1us vs 11.4us unpack1 on qkv).

Suspects:
  S1 the XLA act-quant prologue (absmax reduce + divide + round + cast)
     serializing against the Pallas DMA pipeline
  S2 the (gpk, tn) scale-strip row reads (st_ref[gi,:][None,:]) per group
  S3 int4 only: the per-group lane concat of lo/hi halves

Variants (M=128):
  head8k/kernel      — real w4a8_matmul (act quant in XLA)        [59.7us]
  head8k/kernel_noq  — real Pallas _call, x pre-quantized in-scan (cheap
                       *64 quant, sx=1): isolates S1
  head8k/qonly       — ONLY quantize_acts_per_token per step: the XLA
                       prologue's standalone cost
  head8k/gsstrip     — gscale probe + real (gpk,tn) strip row mul: S2
  qkv/kernel         — real int4 kernel                            [22.1us]
  qkv/kernel_noq     — int4 _call with pre-quantized x: S1 for int4
  qkv/dots2          — per-group TWO K=64 dots on the lo/hi planes, NO
                       concat (group-halves layout makes the slices align
                       with x's logical halves): S3 killer
  qkv/dots2s         — dots2 + strip-row scale mul (the redesign candidate)
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

    from llm_compressor_tpu.kernels.w4a8_matmul import (
        w4a8_matmul, _call, _round_up, quantize_acts_per_token)
    from llm_compressor_tpu.qformats import build_quant_config, quantize_pack

    M = args.M
    GROUP = 128
    rng = np.random.default_rng(0)

    def chain(x, y):
        m = jnp.max(y.astype(jnp.float32))
        return (x.astype(jnp.float32) * 0.999
                + 0.001 * m / (1.0 + jnp.abs(m))).astype(jnp.bfloat16)

    def chain_i8(xi, y):
        m = jnp.max(y.astype(jnp.float32))
        f = xi.astype(jnp.float32) * 0.999 + m / (1.0 + jnp.abs(m))
        return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    # ---------------- probe kernel (strip-scale variants) ----------------
    def probe(x_ref, wp_ref, st_ref, out_ref, acc, *, mode, group, tk, nk):
        k = pl.program_id(2)
        gpk = tk // group
        half = group // 2
        total = None
        if mode == "gsstrip":
            for gi in range(gpk):
                part = jax.lax.dot_general(
                    x_ref[:, gi * group:(gi + 1) * group],
                    wp_ref[:, gi * group:(gi + 1) * group],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                c = part.astype(jnp.float32) * st_ref[gi, :][None, :]
                total = c if total is None else total + c
        elif mode in ("dots2", "dots2s"):
            wp = wp_ref[...].astype(jnp.int32)
            lo = ((wp & 0xF) - 8).astype(jnp.int8)       # (TN, tk/2)
            hi = ((wp >> 4) - 8).astype(jnp.int8)
            for gi in range(gpk):
                pa = jax.lax.dot_general(
                    x_ref[:, gi * group:gi * group + half],
                    lo[:, gi * half:(gi + 1) * half],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                pb = jax.lax.dot_general(
                    x_ref[:, gi * group + half:(gi + 1) * group],
                    hi[:, gi * half:(gi + 1) * half],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                p32 = pa + pb
                if mode == "dots2s":
                    c = p32.astype(jnp.float32) * st_ref[gi, :][None, :]
                else:
                    c = p32.astype(jnp.float32) * (0.01 + gi * 1e-4)
                total = c if total is None else total + c

        @pl.when(k == 0)
        def _():
            acc[...] = total

        @pl.when(k > 0)
        def _():
            acc[...] += total

        @pl.when(k == nk - 1)
        def _():
            out_ref[...] = acc[...].astype(out_ref.dtype)

    def make_probe(mode, qt, C, N, int4, iters):
        nk = max(C // 2048, 1)
        tk = C // nk
        gpk = tk // GROUP
        tm = min(_round_up(M, 32), 256)
        tn = 1024 if N >= 1024 else 512
        wp = (qt.codes.reshape(N, C // 2) if int4 else qt.codes.reshape(N, C))
        st = qt.scales.reshape(N, C // GROUP).T  # (G, N)
        wtk = tk // 2 if int4 else tk

        def call(x_i8, wp, st):
            return pl.pallas_call(
                partial(probe, mode=mode, group=GROUP, tk=tk, nk=nk),
                grid=(-(-M // tm), -(-N // tn), nk),
                in_specs=[
                    pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, wtk), lambda i, j, k: (j, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gpk, tn), lambda i, j, k: (k, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((_round_up(M, tm), N),
                                               jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")),
            )(x_i8, wp, st)

        @jax.jit
        def run(xi0, wp, st):
            def step(xi, _):
                return chain_i8(xi, call(xi, wp, st)), None
            xi, _ = jax.lax.scan(step, xi0, length=iters)
            return xi

        return lambda xi0: run(xi0, wp, st)

    def make_kernel_noq(qt, C, N, int4, iters):
        st = qt.scales.reshape(N, C // GROUP).T
        wp = (qt.codes.reshape(N, C // 2) if int4 else qt.codes.reshape(N, C))
        nk = max(C // 2048, 1)
        tk = C // nk
        tn = 1024 if N >= 1024 else 512
        sx = jnp.ones((_round_up(M, 32), 1), jnp.float32)

        @jax.jit
        def run(xi0, wp, st, sx):
            def step(xi, _):
                y = _call(xi, wp, st, sx, group=GROUP, int4=int4,
                          tm=min(_round_up(M, 32), 256), tn=tn, tk=tk)
                return chain_i8(xi, y), None
            xi, _ = jax.lax.scan(step, xi0, length=iters)
            return xi

        return lambda xi0: run(xi0, wp, st, sx)

    def make_real(qt, iters):
        @jax.jit
        def run(x0, qt):
            def step(x, _):
                return chain(x, w4a8_matmul(x, qt)), None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x
        return lambda x0: run(x0, qt)

    def make_qonly(C, iters):
        @jax.jit
        def run(x0):
            def step(x, _):
                xi, sx = quantize_acts_per_token(x)
                m = jnp.max(xi.astype(jnp.float32)) + jnp.max(sx)
                xn = (x.astype(jnp.float32) * 0.999
                      + 0.001 * m / (1.0 + jnp.abs(m))).astype(jnp.bfloat16)
                return xn, None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x
        return lambda x0: run(x0)

    SHAPES = [
        ("qkv", 2048, 3072, "int4", 16384),
        ("head8k", 2048, 8192, "int8", 2048),
    ]
    runs = []
    for name, C, N, fmt, iters in SHAPES:
        int4 = fmt == "int4"
        q = build_quant_config(f"{fmt}-g[{GROUP}]-rw", None, None, None)
        W = rng.normal(size=(N, C)).astype(np.float32) * 0.02
        qt = quantize_pack(q.linear.weight, jnp.asarray(W))
        x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)
        xi0 = jnp.clip(jnp.round(x0.astype(jnp.float32) * 32), -127, 127
                       ).astype(jnp.int8)
        pbytes = qt.codes.size * qt.codes.dtype.itemsize + qt.scales.nbytes

        runs.append((f"{name}/kernel", make_real(qt, iters), x0, pbytes, iters))
        runs.append((f"{name}/kernel_noq", make_kernel_noq(qt, C, N, int4, iters),
                     xi0, pbytes, iters))
        if int4:
            runs.append((f"{name}/dots2", make_probe("dots2", qt, C, N, int4,
                        iters), xi0, pbytes, iters))
            runs.append((f"{name}/dots2s", make_probe("dots2s", qt, C, N, int4,
                        iters), xi0, pbytes, iters))
        else:
            runs.append((f"{name}/gsstrip", make_probe("gsstrip", qt, C, N,
                        int4, iters), xi0, pbytes, iters))
            runs.append((f"{name}/qonly", make_qonly(C, iters), x0, pbytes,
                         iters))

    for name, fn, x0, _, _ in runs:
        t0 = time.perf_counter()
        jax.device_get(fn(x0)[:1, :1])
        print(f"compiled {name} [{time.perf_counter()-t0:.0f}s]", flush=True)

    for rnd in range(3):
        print(f"--- round {rnd}", flush=True)
        for name, fn, x0, pbytes, iters in runs:
            if x0.dtype == jnp.int8:
                xf = jnp.clip(x0 + rnd + 1, -127, 127).astype(jnp.int8)
            else:
                xf = x0 + 0.01 * (rnd + 1)
            jax.device_get(xf[:1, :1])
            t0 = time.perf_counter()
            jax.device_get(fn(xf)[:1, :1])
            dt = time.perf_counter() - t0
            per = dt / iters * 1e6
            gbs = pbytes * iters / dt / 1e9
            print(f"  {name:20s} {per:9.1f} us/call  {gbs:7.1f} GB/s(w)"
                  f"  [{dt*1e3:6.0f} ms total]", flush=True)


if __name__ == "__main__":
    main()
