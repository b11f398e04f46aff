"""In-context matmul floor: what do the four decode matmuls alone cost?

bench_r3_mid.json says matmuls+glue = 2.75 ms/step at batch 128 while the
packed non-head weights (~0.5 GB) stream at 517 GB/s in ~1.0 ms — but the
scan-unroll A/B (exp_scan_unroll.py: 5.93/5.91/5.90 ms for unroll 1/2/4)
shows the loss is NOT iteration-boundary scheduling. This measures the
stacked W4A8 kernels exactly as the decode scan runs them (scalar-prefetch
layer indexing into (L, N, K/2) buffers, chained through a non-reassociable
max) with NO glue at all, per shape and combined:

    qkv_cat  2048 -> 3072   int4-g128
    o        2048 -> 2048   int4-g128
    gate_up  2048 -> 16384  int4-g128
    down     8192 -> 2048   int4-g128

If [combined] ~= 2.75 ms the kernels are in-context compute-bound at these
shapes (K=group-deep MXU passes) and the glue is already free; if it is
~1.2 ms the glue really costs 1.5 ms and needs a different attack.

Usage: python experiments/exp_matmul_floor.py [--batch 128] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = [  # (name, C, N) — flagship (Llama-3.2-1B) decode projections
    ("qkv", 2048, 3072),
    ("o", 2048, 2048),
    ("gateup", 2048, 16384),
    ("down", 8192, 2048),
]
L = 16


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

    from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
    from llm_compressor_tpu.qformats import build_quant_config, quantize_pack
    from llm_compressor_tpu.qformats.qtensor import QTensor

    q = build_quant_config("int4-g[128]-rw", None, None, None)
    rng = np.random.default_rng(0)
    M = args.batch

    def stacked_qt(C, N):
        """(L, N, C/2) stacked packed QTensor like stack_model emits."""
        qts = [quantize_pack(q.linear.weight,
                             jnp.asarray(rng.normal(size=(N, C))
                                         .astype(np.float32) * 0.02))
               for _ in range(L)]
        codes = jnp.stack([t.codes.reshape(N, C // 2) for t in qts])
        scales = jnp.stack([t.scales.reshape(N, C // 128) for t in qts])
        st = jnp.stack([t.scales.reshape(N, C // 128).T for t in qts])
        return qts[0].replace(codes=codes, scales=scales, scales_t=st)

    weights = {name: stacked_qt(C, N) for name, C, N in SHAPES}
    wbytes = {name: int(weights[name].codes.nbytes
                        + weights[name].scales_t.nbytes)
              for name, _, _ in SHAPES}

    def chain(x, y):
        m = jnp.max(y.astype(jnp.float32))
        return (x * 0.999 + 0.001 * m / (1.0 + jnp.abs(m))).astype(x.dtype)

    def make(names, unroll_layers=False, act_inside=False,
             slice_chain=False):
        qts = [weights[n] for n in names]
        shp = {n: (C, N) for n, C, N in SHAPES}

        def one_layer(x, li):
            for n, qt in zip(names, qts):
                C, N = shp[n]
                xin = x if C == 2048 else jnp.tile(x, (1, C // 2048))
                if act_inside:
                    y = w4a8_matmul(xin.astype(jnp.bfloat16), qt,
                                    act_inside=True)
                else:
                    y = w4a8_matmul(xin.astype(jnp.bfloat16), qt, layer=li)

                if slice_chain:
                    # elementwise-only dependency (like the real model's
                    # residual adds): no scalar reduce in the chain. NOTE
                    # XLA slice-pushes tiny output deps INTO a matmul
                    # (CLAUDE.md) — but y[:, :2048]*eps feeds a full
                    # elementwise add, and the kernel is an opaque custom
                    # call, so the whole output is still computed.
                    x = (x + y[:, :2048].astype(jnp.float32) * 1e-6)\
                        .astype(x.dtype)
                else:
                    x = chain(x, y)
            return x

        @jax.jit
        def run(x0, *qts):
            def layer_body(carry, li):
                return one_layer(carry, li), None

            def step_body(carry, _):
                if unroll_layers:
                    x = carry
                    for li in range(L):
                        x = one_layer(x, jnp.int32(li))
                else:
                    x, _ = jax.lax.scan(layer_body, carry, jnp.arange(L))
                return x, None

            x, _ = jax.lax.scan(step_body, x0, None, length=args.steps)
            return x

        return run, qts

    probe2 = bool(int(os.environ.get("FLOOR_PROBE2", "0")))
    if probe2:
        # round 2 (FLOOR_PROBE2=1): discriminate per-kernel vs per-iteration
        # overhead. qkv x2 = marginal cost of repeating a small kernel;
        # qkv!unroll = python-unrolled layers (no inner scan at all);
        # gateup x2 = marginal cost of repeating a big kernel; all!unroll =
        # the 4-kernel chain without scan machinery.
        # (gateup x2 and the python-unrolled 4-kernel chain blew the
        # tunnel's 100MB compile-payload limit — HTTP 413 — and are
        # dropped; the three qkv variants discriminate the hypotheses.)
        cases = [((["qkv"],), {}), ((["qkv", "qkv"],), {}),
                 ((["qkv"],), dict(unroll_layers=True)),
                 ((["qkv"],), dict(slice_chain=True)),
                 (([n for n, _, _ in SHAPES],), dict(slice_chain=True))]
    else:
        cases = [(([n for n, _, _ in SHAPES],), {}), ((["qkv"],), {}),
                 ((["o"],), {}), ((["gateup"],), {}), ((["down"],), {})]

    variants = {}
    for (names,), kw in cases:
        tag = "+".join(names) + ("!unroll" if kw.get("unroll_layers") else "") \
            + ("!slicechain" if kw.get("slice_chain") else "")
        names_kw = kw
        run, qts = make(names, **names_kw)
        x0 = jnp.asarray(rng.normal(size=(M, 2048)).astype(np.float32),
                         jnp.bfloat16)
        t0 = time.perf_counter()
        jax.device_get(run(x0, *qts)[:1, :8])
        jax.device_get(run(x0 + 0.5, *qts)[:1, :8])  # steady state
        print(f"compiled {tag} in {time.perf_counter()-t0:.0f}s", flush=True)
        variants[tag] = dict(run=run, qts=qts, times=[], seed=1.0,
                             bytes=sum(wbytes[n] for n in names))

    for r in range(args.rounds):
        for tag, v in variants.items():
            x0 = jnp.asarray(rng.normal(size=(M, 2048)).astype(np.float32),
                             jnp.bfloat16)
            jax.device_get(x0[:1, :8])
            t0 = time.perf_counter()
            jax.device_get(v["run"](x0, *v["qts"])[:1, :8])
            dt = (time.perf_counter() - t0) / args.steps * 1e3
            v["times"].append(dt)
            gbs = v["bytes"] * args.steps / (dt / 1e3 * args.steps) / 1e9
            print(f"round {r} {tag:22s} {dt:6.3f} ms/step "
                  f"({gbs:5.0f} GB/s weights)", flush=True)

    out = {tag: round(min(v["times"]), 3) for tag, v in variants.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
