"""Round-4 probe 4: do back-to-back dispatches pipeline over the tunnel?

exp_dispatch_const.py measured a ~25 ms per-dispatch constant (pure RTT:
present at steps=32..512 with a no-op body). If N dispatches enqueued
without intermediate blocking overlap (total = RTT + N*compute), the bench
can amortize RTT by chaining executions; if they serialize
(total = N*(RTT + compute)), the bench must measure and subtract the
same-run RTT constant instead.

Also measures the tiny-fn RTT probe the bench will use.

Usage: python experiments/exp_dispatch_chain.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L = 16
C, N = 2048, 3072
G = 128


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from llm_compressor_tpu.kernels.w4a8_matmul import (
        _call_stacked,
        quantize_acts_per_token,
    )
    from llm_compressor_tpu.qformats import build_quant_config, quantize_pack

    q = build_quant_config("int4-g[128]-rw", None, None, None)
    rng = np.random.default_rng(0)
    M = 128

    r = np.random.default_rng(0)
    qts = [quantize_pack(q.linear.weight,
                         jnp.asarray(r.normal(size=(N, C))
                                     .astype(np.float32) * 0.02))
           for _ in range(L)]
    codes = jnp.stack([t.codes.reshape(N, C // 2) for t in qts])
    st = jnp.stack([t.scales.reshape(N, C // G).T for t in qts])

    def chain(x, y):
        m = jnp.max(y.astype(jnp.float32))
        return (x * 0.999 + 0.001 * m / (1.0 + jnp.abs(m))).astype(x.dtype)

    @jax.jit
    def run(x0, codes, st):
        def step_body(x, _):
            x_i8, sx = quantize_acts_per_token(x.reshape(-1, C))
            sx = sx.astype(jnp.float32)
            tot = None
            for i in range(16):
                y = _call_stacked(x_i8, codes, st, sx,
                                  jnp.asarray(i, jnp.int32), group=G,
                                  int4=True, tm=128, tn=1024, tk=2048)
                tot = y if tot is None else tot + y
            return chain(x, tot), None

        x, _ = jax.lax.scan(step_body, x0, None, length=32)
        return x

    x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32), jnp.bfloat16)
    jax.device_get(run(x0, codes, st)[:1, :8])
    jax.device_get(run(x0 + 0.5, codes, st)[:1, :8])
    print("compiled", flush=True)

    out = {}
    # single-dispatch baseline
    times = []
    for _ in range(4):
        xf = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)
        jax.device_get(xf[:1, :8])
        t0 = time.perf_counter()
        jax.device_get(run(xf, codes, st)[:1, :8])
        times.append((time.perf_counter() - t0) * 1e3)
    out["single_ms"] = round(min(times), 2)

    # 8 chained dispatches, one barrier at the end (distinct inputs)
    R = 8
    times = []
    for _ in range(3):
        xs = [jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                          jnp.bfloat16) for _ in range(R)]
        for x in xs:
            jax.device_get(x[:1, :8])
        t0 = time.perf_counter()
        ys = [run(x, codes, st) for x in xs]
        for y in ys:
            jax.device_get(y[:1, :8])
        times.append((time.perf_counter() - t0) * 1e3)
    out["chain8_ms"] = round(min(times), 2)

    # serially-dependent chain of 8 (output feeds next input)
    times = []
    for _ in range(3):
        xf = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)
        jax.device_get(xf[:1, :8])
        t0 = time.perf_counter()
        y = xf
        for _ in range(R):
            y = run(y, codes, st)
        jax.device_get(y[:1, :8])
        times.append((time.perf_counter() - t0) * 1e3)
    out["dep_chain8_ms"] = round(min(times), 2)

    # tiny-fn RTT probe (what bench.py will measure & subtract)
    @jax.jit
    def tiny(x):
        return x * 1.0000001 + 1.0

    z = jnp.arange(1024, dtype=jnp.float32)
    jax.device_get(tiny(z)[:4])
    times = []
    for i in range(6):
        z2 = z + float(i + 1)
        jax.device_get(z2[:4])
        t0 = time.perf_counter()
        jax.device_get(tiny(z2)[:4])
        times.append((time.perf_counter() - t0) * 1e3)
    out["tiny_rtt_ms"] = round(min(times), 2)
    out["tiny_rtt_all"] = [round(t, 1) for t in times]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
