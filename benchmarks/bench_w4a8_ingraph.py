"""In-graph W4A8 kernel timing — per decode-matmul shape of the flagship.

The older bench_w4a8_variants times host dispatches (unmeasurable under the
tunnel's ~5 ms dispatch latency for sub-ms ops). Here each variant is a
jitted lax.scan of N value-chained calls, so per-call cost INCLUDING the
XLA<->Pallas boundary (the thing the full decode step actually pays 65x per
step) is (total - empty-scan) / N, intra-run comparable.

Variants: w4a8 Pallas kernel (int4 or int8 per shape's serving format),
          XLA bf16 dot (4x the bytes), XLA grouped int8 einsum (no Pallas).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=128)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
    from llm_compressor_tpu.qformats import build_quant_config, quantize_pack

    M, ITERS = args.M, args.iters
    GROUP = 128
    SHAPES = [  # (name, C, N, fmt)
        ("qkv", 2048, 3072, "int4"),
        ("o", 2048, 2048, "int4"),
        ("gateup", 2048, 16384, "int4"),
        ("down", 8192, 2048, "int4"),
        ("head", 2048, 128256, "int8"),
    ]
    rng = np.random.default_rng(0)

    def build(name, C, N, fmt):
        q = build_quant_config(f"{fmt}-g[{GROUP}]-rw", None, None, None)
        W = rng.normal(size=(N, C)).astype(np.float32) * 0.02
        qt = quantize_pack(q.linear.weight, jnp.asarray(W))
        Wd = jnp.asarray(W, jnp.bfloat16)
        # pre-transposed scale strip + unpacked-to-int8 copy for XLA variant
        scales_t = qt.scales.reshape(N, C // GROUP)
        return qt, Wd, scales_t

    def chain(y, C):
        """(M, N) f32/bf16 -> fresh (M, C) bf16 input for the next call
        (value-dependent so no iteration is hoisted or cache-served)."""
        r = jnp.sum(y.astype(jnp.float32), axis=-1, keepdims=True)  # (M, 1)
        base = jax.lax.broadcasted_iota(jnp.float32, (1, C), 1) * 1e-4
        return (base + jnp.tanh(r) * 0.1).astype(jnp.bfloat16)

    # weights ride as jit ARGS everywhere — closed-over device arrays embed
    # in the tunnel compile payload (HTTP 413 >100MB on the vocab head)
    def make_kernel(qt, C):
        @jax.jit
        def run(x0, qt):
            def step(x, _):
                return chain(w4a8_matmul(x, qt), C), None
            x, _ = jax.lax.scan(step, x0, length=ITERS)
            return x
        return lambda x0: run(x0, qt)

    def make_bf16(Wd, C):
        @jax.jit
        def run(x0, Wd):
            def step(x, _):
                y = jnp.dot(x, Wd.T, preferred_element_type=jnp.float32)
                return chain(y, C), None
            x, _ = jax.lax.scan(step, x0, length=ITERS)
            return x
        return lambda x0: run(x0, Wd)

    def make_xla_grouped(qt, scales_t, C, N, fmt):
        codes = qt.codes  # int4: (N, G, g/2) packed; int8: (N, G, g)
        G = C // GROUP
        if fmt == "int4":
            half = GROUP // 2
            w32 = codes.reshape(N, C // 2).astype(jnp.int32)
            lo = ((w32 & 0xF) - 8).astype(jnp.int8).reshape(N, G, half)
            hi = ((w32 >> 4) - 8).astype(jnp.int8).reshape(N, G, half)
            wg = jnp.concatenate([lo, hi], axis=-1)       # (N, G, g) int8
        else:
            wg = codes.reshape(N, G, GROUP)
        # NOTE: materializes int8 weights (int4's HBM advantage is lost) —
        # this variant calibrates the no-Pallas ceiling, not the int4 win.
        @jax.jit
        def run(x0, wg, scales_t):
            def step(x, _):
                xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 64), -127, 127
                              ).astype(jnp.int8).reshape(M, G, GROUP)
                p32 = jnp.einsum("mgc,ngc->mng", xi, wg,
                                 preferred_element_type=jnp.int32)
                y = jnp.einsum("mng,ng->mn", p32.astype(jnp.float32), scales_t)
                return chain(y, C), None
            x, _ = jax.lax.scan(step, x0, length=ITERS)
            return x
        wg = jax.device_put(wg)
        return lambda x0: run(x0, wg, scales_t)

    @jax.jit
    def empty(x0):
        x, _ = jax.lax.scan(lambda x, _: (chain(x[:, :1] * 1.0001, x.shape[1]), None),
                            x0, length=ITERS)
        return x

    runs = []
    for name, C, N, fmt in SHAPES:
        qt, Wd, scales_t = build(name, C, N, fmt)
        x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)
        pbytes = qt.codes.size * qt.codes.dtype.itemsize + qt.scales.nbytes
        runs.append((f"{name}[{fmt}]/kernel", make_kernel(qt, C), x0, pbytes))
        runs.append((f"{name}/bf16", make_bf16(Wd, C), x0, Wd.nbytes))
        runs.append((f"{name}/xla_i8", make_xla_grouped(qt, scales_t, C, N, fmt),
                     x0, N * C + scales_t.nbytes))
    x0e = jnp.asarray(rng.normal(size=(M, 2048)).astype(np.float32), jnp.bfloat16)
    runs.append(("empty", empty, x0e, 0))

    for name, fn, x0, _ in runs:
        fn(x0).block_until_ready()
        print(f"compiled {name}", flush=True)

    for rnd in range(3):
        print(f"--- round {rnd}", flush=True)
        for name, fn, x0, pbytes in runs:
            xf = (x0 + 0.01 * (rnd + 1)).block_until_ready()
            t0 = time.perf_counter()
            fn(xf).block_until_ready()
            dt = time.perf_counter() - t0
            per = dt / ITERS * 1e6
            gbs = pbytes * ITERS / dt / 1e9
            print(f"  {name:22s} {per:9.1f} us/call  {gbs:7.1f} GB/s(w)",
                  flush=True)


if __name__ == "__main__":
    main()
