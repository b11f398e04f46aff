"""Round-4 probe: what is the ~47us/LAYER fixed decode cost?

Round-3 floor study (exp_matmul_floor.py + log): a 16-layer scan of ONE
stacked qkv kernel costs ~60us/layer while the marginal cost of a SECOND
identical kernel in the same layer is only ~13us (= the kernel's own
streaming rate) — and the 4-kernel chain (170us/layer) is far below the
sum of single-kernel chains (321us). Scan machinery (python-unroll ties)
and act-quant (CSE probe) are eliminated. Remaining hypotheses, one
variant each (all: L=16 layers, 32 steps in one lax.scan dispatch, b128):

  base      qkv stacked scalar-prefetch, tk=2048 (grid (1,3,1)) — repro.
  tk1024    same but tk=1024 -> grid (1,3,2): short-grid pipelining test.
  tk512     tk=512 -> grid (1,3,4).
  tn512     tn=512, tk=2048 -> grid (1,6,1): more j programs.
  direct    python-unrolled layers, PER-LAYER 2D buffers through _call
            (no scalar prefetch, no stacked indexing). If this runs at
            ~stream rate the stacked scalar-prefetch DMA is the mechanism.
  qkv2      chain qkvA -> qkvB per layer, TWO different stacked buffers:
            marginal cost of a second kernel with FRESH addresses
            (round 3's qkv+qkv marginal reused the same buffer).
  indep     16 kernels per step, all reading x0 (no serial dependency),
            different layer indices, outputs summed then chained: pure
            per-call cost with zero dependency stalls.

Usage: python experiments/exp_fixed_cost.py [--batch 128] [--steps 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L = 16
C, N = 2048, 3072  # qkv_cat shape of the flagship (Llama-3.2-1B)
G = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from llm_compressor_tpu.kernels.w4a8_matmul import (
        _call,
        _call_stacked,
        quantize_acts_per_token,
    )
    from llm_compressor_tpu.qformats import build_quant_config, quantize_pack

    q = build_quant_config("int4-g[128]-rw", None, None, None)
    rng = np.random.default_rng(0)
    M = args.batch

    def one_qt(seed):
        r = np.random.default_rng(seed)
        return quantize_pack(q.linear.weight,
                             jnp.asarray(r.normal(size=(N, C))
                                         .astype(np.float32) * 0.02))

    def stacked(seed0):
        qts = [one_qt(seed0 + i) for i in range(L)]
        codes = jnp.stack([t.codes.reshape(N, C // 2) for t in qts])
        st = jnp.stack([t.scales.reshape(N, C // G).T for t in qts])
        return codes, st

    codesA, stA = stacked(0)
    codesB, stB = stacked(100)
    flat = [(codesA[i], stA[i]) for i in range(L)]  # per-layer 2D buffers
    per_layer_bytes = int(codesA[0].nbytes + stA[0].nbytes)

    def chain(x, y):
        m = jnp.max(y.astype(jnp.float32))
        return (x * 0.999 + 0.001 * m / (1.0 + jnp.abs(m))).astype(x.dtype)

    def kern_stacked(x, codes, st, li, tk, tn=1024):
        x_i8, sx = quantize_acts_per_token(x.reshape(-1, C))
        return _call_stacked(x_i8, codes, st, sx.astype(jnp.float32),
                             jnp.asarray(li, jnp.int32), group=G, int4=True,
                             tm=128, tn=tn, tk=tk)

    def kern_flat(x, codes2d, st2d, tk=2048, tn=1024):
        x_i8, sx = quantize_acts_per_token(x.reshape(-1, C))
        return _call(x_i8, codes2d, st2d, sx.astype(jnp.float32),
                     group=G, int4=True, tm=128, tn=tn, tk=tk)

    def make_scan(layer_fn, extra):
        """steps-scan around a 16-layer lax.scan of layer_fn(x, li)."""
        @jax.jit
        def run(x0, *ops):
            def layer_body(carry, li):
                return layer_fn(carry, li, *ops), None

            def step_body(carry, _):
                x, _ = jax.lax.scan(layer_body, carry, jnp.arange(L))
                return x, None

            x, _ = jax.lax.scan(step_body, x0, None, length=args.steps)
            return x

        return run, extra

    def make_unrolled(body_fn, extra):
        """steps-scan around a PYTHON-unrolled 16-layer body_fn(x, *ops)."""
        @jax.jit
        def run(x0, *ops):
            def step_body(carry, _):
                return body_fn(carry, *ops), None

            x, _ = jax.lax.scan(step_body, x0, None, length=args.steps)
            return x

        return run, extra

    def v_base(tk, tn=1024):
        def layer(x, li, codes, st):
            return chain(x, kern_stacked(x, codes, st, li, tk, tn))
        return make_scan(layer, (codesA, stA))

    def v_direct():
        def body(x, *ops):
            for i in range(L):
                x = chain(x, kern_flat(x, ops[2 * i], ops[2 * i + 1]))
            return x
        flat_ops = [a for pair in flat for a in pair]
        return make_unrolled(body, tuple(flat_ops))

    def v_qkv2():
        def layer(x, li, cA, sA, cB, sB):
            x = chain(x, kern_stacked(x, cA, sA, li, 2048))
            x = chain(x, kern_stacked(x, cB, sB, li, 2048))
            return x
        return make_scan(layer, (codesA, stA, codesB, stB))

    def v_indep():
        def body(x, codes, st):
            tot = None
            x_i8, sx = quantize_acts_per_token(x.reshape(-1, C))
            sx = sx.astype(jnp.float32)
            for i in range(L):
                y = _call_stacked(x_i8, codes, st, sx,
                                  jnp.asarray(i, jnp.int32), group=G,
                                  int4=True, tm=128, tn=1024, tk=2048)
                tot = y if tot is None else tot + y
            return chain(x, tot)
        return make_unrolled(body, (codesA, stA))

    builders = {
        "base": lambda: v_base(2048),
        "tk1024": lambda: v_base(1024),
        "tk512": lambda: v_base(512),
        "tn512": lambda: v_base(2048, tn=512),
        "direct": v_direct,
        "qkv2": v_qkv2,
        "indep": v_indep,
    }
    if args.only:
        keep = args.only.split(",")
        builders = {k: v for k, v in builders.items() if k in keep}

    variants = {}
    for tag, b in builders.items():
        run, ops = b()
        x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)
        t0 = time.perf_counter()
        try:
            jax.device_get(run(x0, *ops)[:1, :8])
            jax.device_get(run(x0 + 0.5, *ops)[:1, :8])  # steady state
        except Exception as e:
            print(f"variant {tag} FAILED: {type(e).__name__}: {e}"[:300],
                  flush=True)
            continue
        print(f"compiled {tag} in {time.perf_counter() - t0:.0f}s",
              flush=True)
        nker = {"qkv2": 2, "indep": L}.get(tag, 1)
        variants[tag] = dict(run=run, ops=ops, times=[],
                             bytes=per_layer_bytes * L * nker
                             if tag != "qkv2" else per_layer_bytes * L * 2)

    for r in range(args.rounds):
        for tag, v in variants.items():
            x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                             jnp.bfloat16)
            jax.device_get(x0[:1, :8])
            t0 = time.perf_counter()
            jax.device_get(v["run"](x0, *v["ops"])[:1, :8])
            dt = (time.perf_counter() - t0) / args.steps * 1e3
            v["times"].append(dt)
            us_layer = dt * 1e3 / L
            gbs = v["bytes"] / (dt / 1e3) / 1e9
            print(f"round {r} {tag:8s} {dt:6.3f} ms/step "
                  f"{us_layer:6.1f} us/layer ({gbs:5.0f} GB/s)", flush=True)

    out = {tag: round(min(v["times"]), 3) for tag, v in variants.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
