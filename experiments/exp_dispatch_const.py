"""Round-4 probe 3: split per-DISPATCH constant from per-step cost.

exp_fixed_cost2.py found the zero-kernel scan body costs 0.77 ms/"step" at
steps=32 — i.e. ~24.6 ms per dispatch, suspiciously equal to the axon
tunnel's measured 30-40 ms dispatch RTT (CLAUDE.md). If t_total(steps) =
c + s*steps with c ~ 25-30 ms and s ~ 0 for the no-kernel body, then the
round-3 "47 us/layer fixed decode cost" was MEASUREMENT (RTT amortized
over too few steps), not on-chip time — and the bench's 32-step decode
timing overstates step time by ~17%.

Runs n0 (no kernels) and n16 (16 independent qkv kernels/step) at
steps in {32, 128, 512} and fits the line per variant.

Usage: python experiments/exp_dispatch_const.py
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
STEPS = (32, 128, 512)


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

    def make(n_kernels, steps):
        @jax.jit
        def run(x0, codes, st):
            def step_body(x, _):
                x_i8, sx = quantize_acts_per_token(x.reshape(-1, C))
                sx = sx.astype(jnp.float32)
                if n_kernels == 0:
                    y = x_i8.astype(jnp.bfloat16) * sx
                else:
                    tot = None
                    for i in range(n_kernels):
                        y = _call_stacked(x_i8, codes, st, sx,
                                          jnp.asarray(i, jnp.int32),
                                          group=G, int4=True, tm=128,
                                          tn=1024, tk=2048)
                        tot = y if tot is None else tot + y
                    y = tot
                return chain(x, y), None

            x, _ = jax.lax.scan(step_body, x0, None, length=steps)
            return x

        return run

    results = {}
    for n in (0, 16):
        for steps in STEPS:
            tag = f"n{n}@{steps}"
            run = make(n, steps)
            x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                             jnp.bfloat16)
            t0 = time.perf_counter()
            jax.device_get(run(x0, codes, st)[:1, :8])
            jax.device_get(run(x0 + 0.5, codes, st)[:1, :8])
            print(f"compiled {tag} in {time.perf_counter() - t0:.0f}s",
                  flush=True)
            times = []
            for rd in range(4):
                x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                                 jnp.bfloat16)
                jax.device_get(x0[:1, :8])
                t0 = time.perf_counter()
                jax.device_get(run(x0, codes, st)[:1, :8])
                times.append((time.perf_counter() - t0) * 1e3)
            best = min(times)
            results[tag] = round(best, 2)
            print(f"{tag:9s} total {best:8.2f} ms  "
                  f"({best / steps * 1e3:7.1f} us/step)", flush=True)

    for n in (0, 16):
        ts = np.array([results[f"n{n}@{s}"] for s in STEPS], float)
        A = np.vstack([np.ones(len(STEPS)), STEPS]).T
        (c, s), *_ = np.linalg.lstsq(A, ts, rcond=None)
        results[f"n{n}_dispatch_const_ms"] = round(float(c), 2)
        results[f"n{n}_per_step_us"] = round(float(s) * 1e3, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
