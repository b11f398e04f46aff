"""Round 3: why did in-kernel act quant NOT move the needle?

All variants share the SAME harness (bf16 (M, C) carry, chain through a
global max of the output) so deltas are pure. An ``empty`` variant gives
the per-scan-step floor (chain only).

Variants:
  empty  — chain(x, x): per-iteration floor
  actq   — w4a8_matmul (new in-kernel act-quant path)
  xlaq   — quantize_acts_per_token in XLA + _call (the old path, explicit)
  kbody  — cheap int8 cast (round(x*64), no reduce/no divide) + _call:
           kernel + relayout cost without the absmax/divide machinery
  qonly  — quantize_acts_per_token alone (no kernel)
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from llm_compressor_tpu.kernels.w4a8_matmul import (
        w4a8_matmul, _call, _pick_tk, _round_up, quantize_acts_per_token)
    from llm_compressor_tpu.qformats import build_quant_config, quantize_pack

    M = args.M
    GROUP = 128
    rng = np.random.default_rng(0)

    def chain(x, y):
        m = jnp.max(y.astype(jnp.float32))
        return (x.astype(jnp.float32) * 0.999
                + 0.001 * m / (1.0 + jnp.abs(m))).astype(jnp.bfloat16)

    SHAPES = [
        ("qkv", 2048, 3072, "int4", 16384),
        ("head8k", 2048, 8192, "int8", 2048),
    ]
    runs = []

    def build_shape(name, C, N, fmt, iters):
        # separate scope per shape: the jits trace lazily, so closure
        # variables must be bound per shape, not shared loop variables
        int4 = fmt == "int4"
        q = build_quant_config(f"{fmt}-g[{GROUP}]-rw", None, None, None)
        W = rng.normal(size=(N, C)).astype(np.float32) * 0.02
        qt = quantize_pack(q.linear.weight, jnp.asarray(W))
        x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)
        pbytes = qt.codes.size * qt.codes.dtype.itemsize + qt.scales.nbytes
        wp = (qt.codes.reshape(N, C // 2) if int4 else qt.codes.reshape(N, C))
        st = qt.scales.reshape(N, C // GROUP).T
        tm = min(_round_up(M, 32), 256)
        tn = 1024
        tk = _pick_tk(C, GROUP)
        ones = jnp.ones((_round_up(M, tm), 1), jnp.float32)

        def make(body, extra):
            @jax.jit
            def run(x0, *extra):
                def step(x, _):
                    return chain(x, body(x, *extra)), None
                x, _ = jax.lax.scan(step, x0, length=iters)
                return x
            return lambda x0: run(x0, *extra)

        def b_empty(x):
            return x

        def b_actq(x, qt):
            return w4a8_matmul(x, qt)

        def b_xlaq(x, wp, st):
            xi, sx = quantize_acts_per_token(x)
            return _call(xi, wp, st, sx, group=GROUP, int4=int4,
                         tm=tm, tn=tn, tk=tk)

        def b_kbody(x, wp, st, ones):
            xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 64),
                          -127, 127).astype(jnp.int8)
            return _call(xi, wp, st, ones, group=GROUP, int4=int4,
                         tm=tm, tn=tn, tk=tk)

        def b_qonly(x):
            xi, sx = quantize_acts_per_token(x)
            return xi.astype(jnp.float32) + sx

        for tag, body, extra in [
            ("empty", b_empty, ()),
            ("actq", b_actq, (qt,)),
            ("xlaq", b_xlaq, (wp, st)),
            ("kbody", b_kbody, (wp, st, ones)),
            ("qonly", b_qonly, ()),
        ]:
            runs.append((f"{name}/{tag}", make(body, extra), x0, pbytes,
                         iters))

    for shape in SHAPES:
        build_shape(*shape)

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
            print(f"  {name:16s} {per:9.1f} us/call  {gbs:7.1f} GB/s(w)"
                  f"  [{dt*1e3:6.0f} ms total]", flush=True)


if __name__ == "__main__":
    main()
