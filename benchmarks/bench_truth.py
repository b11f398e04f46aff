"""Honest chip measurements via scan-in-jit with length differencing.

Chained *dispatches* of the same executable report impossible speeds on the
axon tunnel (128MB in-place add "runs" at 17 TB/s), so per-op timing here
runs K dependent iterations inside ONE jitted lax.scan and differences two
lengths: per_step = (T(K2) - T(K1)) / (K2 - K1). That cancels dispatch +
fixed compile/launch costs and cannot be served from any dispatch cache.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K1, K2 = 64, 256


def scan_time(body, x0, w, length, reps=5):
    """body(x, w) -> x'. ``w`` is an explicit arg (closure-captured arrays
    get embedded in the remote-compile payload -> HTTP 413 for >100MB)."""
    @jax.jit
    def run(x, w):
        return jax.lax.scan(lambda c, _: (body(c, w), None), x, length=length)[0]

    out = run(x0, w)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x0, w)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def measure(name, body, x0, w, nbytes=None):
    t1, _ = scan_time(body, x0, w, K1)
    t2, _ = scan_time(body, x0, w, K2)
    per = (t2 - t1) / (K2 - K1)
    msg = f"  {name:48s} {per*1e6:9.1f} us/step"
    if nbytes:
        msg += f"   {nbytes/per/1e9:7.0f} GB/s"
    print(msg)
    return per


def main():
    print(f"backend={jax.default_backend()}  (scan diff {K1}->{K2})")
    rng = np.random.default_rng(0)

    # --- HBM stream bandwidth (with execution proof) ----------------------
    big = jnp.zeros((64, 1024, 1024), jnp.bfloat16)  # 128MB
    _, out = scan_time(lambda x, w: x + 1, big, jnp.zeros(()), 8)
    assert float(out[0, 0, 0]) == 8.0, float(out[0, 0, 0])  # really executed
    measure("in-place add 128MB (r+w)", lambda x, w: x + 1, big,
            jnp.zeros(()), nbytes=256e6)
    del big

    # --- matmuls at decode shapes ----------------------------------------
    from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
    from llm_compressor_tpu.kernels.dequant_matmul import dequant_matmul
    from llm_compressor_tpu.qformats.config import parse_qspec
    from llm_compressor_tpu.qformats.qtensor import quantize_pack

    M = 32
    for (N, C, tag) in [(8192, 2048, "gate/up"), (2048, 8192, "down"),
                        (128256, 2048, "head")]:
        print(f"shape ({M}x{C}) @ ({N}x{C})^T  [{tag}]")
        wreal = jnp.asarray(rng.standard_normal((N, C)) * 0.02, jnp.bfloat16)
        x0 = jnp.asarray(rng.standard_normal((M, C)), jnp.bfloat16)

        def dep(x, y):  # cheap, un-DCE-able dependency back to the carry
            return x + (y[:, :1] * 1e-9).astype(x.dtype)

        measure("bf16 dot", lambda x, w: dep(x, jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())))), x0, wreal, nbytes=N * C * 2)

        qt4 = quantize_pack(parse_qspec("int4-g[128]-rw"), wreal)
        measure("w4a8 int4-g128", lambda x, w: dep(x, w4a8_matmul(x, w)), x0,
                qt4, nbytes=N * C // 2)
        measure("dequant-matmul int4-g128",
                lambda x, w: dep(x, dequant_matmul(x, w)), x0, qt4,
                nbytes=N * C // 2)
        qt8 = quantize_pack(parse_qspec("int8-g[128]-rw"), wreal)
        measure("w4a8 int8-g128", lambda x, w: dep(x, w4a8_matmul(x, w)), x0,
                qt8, nbytes=N * C)


if __name__ == "__main__":
    main()
