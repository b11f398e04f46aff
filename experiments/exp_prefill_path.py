"""Round-4: arbitrate the PREFILL weight path (VERDICT r3 item 4).

At prefill M (b8 x 512 = 4096 rows) each projection currently routes to
the dequant-to-bf16 Pallas kernel (models/layers.py: m_rows > 256).
Candidates, timed per flagship projection shape at M=4096 with honest
chained+RTT-subtracted timing:

    dequant — kernels/dequant_matmul.py (current choice)
    w4a8    — kernels/w4a8_matmul.py (int8 acts; int8xint8 MXU has 2x
              bf16 peak, but the kernel's per-group VPU scale-accum is
              O(M*N*C/g) — the reason it was decode-only)
    xla     — plain XLA: dequantize codes to bf16 + lax.dot_general

Each variant runs L=8 chained layer iterations x 8 steps in one dispatch.

Usage: python experiments/exp_prefill_path.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = [  # flagship prefill projections
    ("qkv", 2048, 3072),
    ("o", 2048, 2048),
    ("gateup", 2048, 16384),
    ("down", 8192, 2048),
]
L = 8
STEPS = 8
G = 128


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from llm_compressor_tpu.kernels.dequant_matmul import dequant_matmul
    from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
    from llm_compressor_tpu.qformats import (
        build_quant_config,
        dequantize,
        quantize_pack,
    )

    q = build_quant_config("int4-g[128]-rw", None, None, None)
    rng = np.random.default_rng(0)
    M = 4096

    def rtt_ms():
        @jax.jit
        def tiny(x):
            return x * 1.0000001 + 1.0

        z = jnp.arange(1024, dtype=jnp.float32)
        jax.device_get(tiny(z)[:4])
        ts = []
        for i in range(5):
            z2 = z + float(i + 1)
            jax.device_get(z2[:4])
            t0 = time.perf_counter()
            jax.device_get(tiny(z2)[:4])
            ts.append((time.perf_counter() - t0) * 1e3)
        return min(ts)

    rtt = rtt_ms()
    out = {"rtt_ms": round(rtt, 1), "M": M}
    print(f"rtt {rtt:.1f} ms", flush=True)

    for name, C, N in SHAPES:
        qt = quantize_pack(q.linear.weight,
                           jnp.asarray(rng.normal(size=(N, C))
                                       .astype(np.float32) * 0.02))
        flops = 2.0 * M * N * C

        def chain(x, y):
            m = jnp.max(jnp.abs(y.astype(jnp.float32)))
            return (x * 0.999 + 0.001 * m / (1.0 + m)).astype(x.dtype)

        def make(kind):
            @jax.jit
            def run(x0, qt):
                def step(x, _):
                    for _ in range(L):
                        xin = x if C == 2048 else jnp.tile(x, (1, C // 2048))
                        if kind == "dequant":
                            y = dequant_matmul(xin, qt)
                        elif kind == "w4a8":
                            y = w4a8_matmul(xin, qt)
                        else:
                            w = dequantize(qt).astype(jnp.bfloat16)
                            y = jax.lax.dot_general(
                                xin, w,
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ).astype(jnp.bfloat16)
                        x = chain(x, y)
                    return x, None

                x, _ = jax.lax.scan(step, x0, None, length=STEPS)
                return x

            return run

        for kind in ("dequant", "w4a8", "xla"):
            run = make(kind)
            x0 = jnp.asarray(rng.normal(size=(M, 2048)).astype(np.float32),
                             jnp.bfloat16)
            tag = f"{name}_{kind}"
            try:
                t0 = time.perf_counter()
                jax.device_get(run(x0, qt)[:1, :8])
                jax.device_get(run(x0 + 0.5, qt)[:1, :8])
                print(f"compiled {tag} in {time.perf_counter()-t0:.0f}s",
                      flush=True)
            except Exception as e:
                print(f"{tag} FAILED {type(e).__name__}: {e}"[:200],
                      flush=True)
                continue
            best = None
            for _ in range(3):
                xf = jnp.asarray(
                    rng.normal(size=(M, 2048)).astype(np.float32),
                    jnp.bfloat16)
                jax.device_get(xf[:1, :8])
                t0 = time.perf_counter()
                jax.device_get(run(xf, qt)[:1, :8])
                dt = (time.perf_counter() - t0) * 1e3 - rtt
                best = dt if best is None else min(best, dt)
            per_mm_us = best * 1e3 / (L * STEPS)
            tf = flops / (per_mm_us * 1e-6) / 1e12
            out[tag + "_us"] = round(per_mm_us, 1)
            out[tag + "_tflops"] = round(tf, 1)
            print(f"{tag:16s} {per_mm_us:8.1f} us/matmul  {tf:6.1f} TFLOP/s",
                  flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
