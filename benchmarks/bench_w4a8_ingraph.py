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
    ap.add_argument("--iters", type=int, default=0)
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

    M = args.M
    GROUP = 128
    # per-shape scan lengths sized so one dispatch does >= ~60 GB of weight
    # traffic (~200 ms at 300 GB/s) — the tunnel's dispatch round trip
    # measured ~33 ms this session, so shorter calls are RTT noise
    SHAPES = [  # (name, C, N, fmt, iters)
        ("qkv", 2048, 3072, "int4", 16384),
        ("o", 2048, 2048, "int4", 16384),
        ("gateup", 2048, 16384, "int4", 3072),
        ("down", 8192, 2048, "int4", 3072),
        ("head", 2048, 128256, "int8", 224),
    ]
    if args.iters:
        SHAPES = [(n, C, N, f, args.iters) for (n, C, N, f, _) in SHAPES]
    rng = np.random.default_rng(0)

    def build(name, C, N, fmt):
        q = build_quant_config(f"{fmt}-g[{GROUP}]-rw", None, None, None)
        W = rng.normal(size=(N, C)).astype(np.float32) * 0.02
        qt = quantize_pack(q.linear.weight, jnp.asarray(W))
        Wd = jnp.asarray(W, jnp.bfloat16)
        # pre-transposed scale strip + unpacked-to-int8 copy for XLA variant
        scales_t = qt.scales.reshape(N, C // GROUP)
        return qt, Wd, scales_t

    def chain(x, y):
        """Evolve the (M, C) input using a GLOBAL MAX over the (M, N)
        output: a reduction XLA cannot reassociate through the dot (a sum
        would collapse to x @ rowsum(W)!) that keeps every output column
        live (a slice dep would let XLA compute only those columns —
        CLAUDE.md). x drifts each iteration so no two dispatches or
        iterations see equal values."""
        m = jnp.max(y.astype(jnp.float32))
        return (x.astype(jnp.float32) * 0.999
                + 0.001 * m / (1.0 + jnp.abs(m))).astype(jnp.bfloat16)

    # weights ride as jit ARGS everywhere — closed-over device arrays embed
    # in the tunnel compile payload (HTTP 413 >100MB on the vocab head)
    def make_kernel(qt, C, iters):
        @jax.jit
        def run(x0, qt):
            def step(x, _):
                return chain(x, w4a8_matmul(x, qt)), None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x
        return lambda x0: run(x0, qt)

    def make_bf16(Wd, C, iters):
        @jax.jit
        def run(x0, Wd):
            def step(x, _):
                y = jnp.dot(x, Wd.T, preferred_element_type=jnp.float32)
                return chain(x, y), None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x
        return lambda x0: run(x0, Wd)

    def make_xla_grouped(qt, scales_t, C, N, fmt, iters):
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
                return chain(x, y), None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x
        wg = jax.device_put(wg)
        return lambda x0: run(x0, wg, scales_t)

    runs = []
    for name, C, N, fmt, iters in SHAPES:
        qt, Wd, scales_t = build(name, C, N, fmt)
        x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)
        pbytes = qt.codes.size * qt.codes.dtype.itemsize + qt.scales.nbytes
        runs.append((f"{name}[{fmt}]/kernel", make_kernel(qt, C, iters),
                     x0, pbytes, iters))
        runs.append((f"{name}/bf16", make_bf16(Wd, C, iters), x0, Wd.nbytes,
                     iters))
        runs.append((f"{name}/xla_i8",
                     make_xla_grouped(qt, scales_t, C, N, fmt, iters),
                     x0, N * C + scales_t.nbytes, iters))

    for name, fn, x0, _, _ in runs:
        jax.device_get(fn(x0)[:1, :1])
        print(f"compiled {name}", flush=True)

    for rnd in range(3):
        print(f"--- round {rnd}", flush=True)
        for name, fn, x0, pbytes, iters in runs:
            xf = x0 + 0.01 * (rnd + 1)
            jax.device_get(xf[:1, :1])   # drain queue; fresh values
            t0 = time.perf_counter()
            # device_get of a 1-element slice is the completion barrier —
            # block_until_ready may return at enqueue on this tunnel
            jax.device_get(fn(xf)[:1, :1])
            dt = time.perf_counter() - t0
            per = dt / iters * 1e6
            gbs = pbytes * iters / dt / 1e9
            print(f"  {name:22s} {per:9.1f} us/call  {gbs:7.1f} GB/s(w)"
                  f"  [{dt*1e3:6.0f} ms total]", flush=True)


if __name__ == "__main__":
    main()
