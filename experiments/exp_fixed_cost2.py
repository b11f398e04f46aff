"""Round-4 probe 2: scale the INDEPENDENT-kernel count per step.

exp_fixed_cost.py found 16 independent stacked-qkv kernels per step cost
0.95 ms (same as the serial 16-layer chain) while 32 kernels cost only
+0.25 ms more — a ~0.7 ms/step block that is not per-kernel, not serial
stalls, not grid shape, not scalar-prefetch indexing. This sweeps the
kernel count n in {1, 2, 4, 8, 16} (same structure: one act-quant, n
kernels on distinct layers, outputs summed, one chain into the carry) and
adds a ZERO-kernel glue-only variant. A linear fit t(n) = a + b*n says
whether the block is a per-step constant (a ~ 0.7 ms even at n=0/1) or
something that saturates.

Usage: python experiments/exp_fixed_cost2.py
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

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
    M = args.batch

    def stacked(seed0):
        r = np.random.default_rng(seed0)
        qts = [quantize_pack(q.linear.weight,
                             jnp.asarray(r.normal(size=(N, C))
                                         .astype(np.float32) * 0.02))
               for _ in range(L)]
        codes = jnp.stack([t.codes.reshape(N, C // 2) for t in qts])
        st = jnp.stack([t.scales.reshape(N, C // G).T for t in qts])
        return codes, st

    codesA, stA = stacked(0)
    per_layer_bytes = int(codesA[0].nbytes + stA[0].nbytes)

    def chain(x, y):
        m = jnp.max(y.astype(jnp.float32))
        return (x * 0.999 + 0.001 * m / (1.0 + jnp.abs(m))).astype(x.dtype)

    def make_indep(n_kernels):
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

            x, _ = jax.lax.scan(step_body, x0, None, length=args.steps)
            return x

        return run

    variants = {}
    for n in (0, 1, 2, 4, 8, 16):
        tag = f"n{n}"
        run = make_indep(n)
        x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)
        t0 = time.perf_counter()
        jax.device_get(run(x0, codesA, stA)[:1, :8])
        jax.device_get(run(x0 + 0.5, codesA, stA)[:1, :8])
        print(f"compiled {tag} in {time.perf_counter() - t0:.0f}s",
              flush=True)
        variants[tag] = dict(run=run, times=[], bytes=per_layer_bytes * n)

    for r in range(args.rounds):
        for tag, v in variants.items():
            x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                             jnp.bfloat16)
            jax.device_get(x0[:1, :8])
            t0 = time.perf_counter()
            jax.device_get(v["run"](x0, codesA, stA)[:1, :8])
            dt = (time.perf_counter() - t0) / args.steps * 1e3
            v["times"].append(dt)
            gbs = v["bytes"] / (dt / 1e3) / 1e9 if v["bytes"] else 0.0
            print(f"round {r} {tag:4s} {dt:7.3f} ms/step ({gbs:5.0f} GB/s)",
                  flush=True)

    out = {tag: round(min(v["times"]), 3) for tag, v in variants.items()}
    ns = [0, 1, 2, 4, 8, 16]
    ts = [out[f"n{n}"] for n in ns]
    A = np.vstack([np.ones(len(ns)), ns]).T
    coef, *_ = np.linalg.lstsq(A, np.array(ts), rcond=None)
    out["fit_a_ms"] = round(float(coef[0]), 4)
    out["fit_b_us_per_kernel"] = round(float(coef[1]) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
