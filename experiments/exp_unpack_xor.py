"""Time the int4 W4A8 kernel at the flagship decode shapes under the
current unpack strategy (module flag; run once plain and once with
LLMC_INT4_UNPACK=i32 to A/B the bitwise-ops unpack vs the legacy int32
round-trip). Prints per-shape ms and GB/s of PACKED bytes streamed.

Timing per CLAUDE.md tunnel rules: value-chained reps (the activation is
perturbed from the previous output, so no dispatch is tunnel-cache
servable), >=200 ms per timed call, device_get completion barrier.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import importlib

    wm = importlib.import_module("llm_compressor_tpu.kernels.w4a8_matmul")
    from llm_compressor_tpu.qformats import ElemFormat, Quantizer, quantize_pack

    mode = getattr(wm, "_UNPACK", "hybrid")
    M, g = 128, 128
    shapes = [("qkv_cat", 3072, 2048), ("o", 2048, 2048),
              ("gateup", 16384, 2048), ("down", 2048, 8192)]

    rng = np.random.default_rng(0)
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=g)
    for name, N, C in shapes:
        qt = quantize_pack(q, jnp.asarray(
            rng.normal(0, 0.05, size=(N, C)).astype(np.float32)))
        x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
        # size the chain for ~0.4 s of REAL kernel compute per timed call
        # (the ~25 ms tunnel dispatch latency otherwise swamps it)
        reps = max(256, int(0.4 / (N * C // 2 / 150e9)) // 64 * 64)

        @jax.jit
        def run(x, codes, scales_t, scales):
            qt2 = qt.replace(codes=codes, scales_t=scales_t, scales=scales)

            def step(i, carry):
                x, acc = carry
                y = wm.w4a8_matmul(x, qt2)
                m = jnp.max(jnp.abs(y))
                # chain through a non-reassociable reduction of the FULL
                # output; renormalized x keeps values fresh every rep
                xn = x * (0.999 + 0.002 * (m / (m + 1.0)))
                return (xn[:, :C], acc + m)

            _, acc = jax.lax.fori_loop(0, reps, step, (x, 0.0))
            return acc

        args = (qt.codes, qt.scales_t, qt.scales)
        jax.device_get(run(x0, *args))               # compile + first-exec
        jax.device_get(run(x0 * 1.01, *args))        # steady state
        x1 = x0 * 0.98 + 0.01
        jax.device_get(x1[:1, :8])
        t0 = time.perf_counter()
        jax.device_get(run(x1, *args))
        dt = time.perf_counter() - t0
        gbs = reps * qt.codes.size / dt / 1e9
        print(f"[{mode}] {name:8s} N={N:6d} C={C:5d}: "
              f"{dt / reps * 1e3:7.3f} ms/rep  {gbs:6.1f} GB/s packed",
              flush=True)


if __name__ == "__main__":
    main()
