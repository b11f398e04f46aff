"""What does one fresh-block write actually cost, and does merging buffers
help?  (append budget: 0.38 ms/step at batch 128 = ~6 us per DUS pair —
bench_r3_mid.json)

Mimics the decode scan's write pattern: outer scan over 32 steps, inner
scan over 16 layers, each inner iteration writes this layer's K/V codes
(B, KV, D, 1) + scales at lane t — exactly kvcache.write_fresh — with the
carry chained through the buffers so nothing is dead. Variants:

  4dus   — k, v, ks, vs separate buffers (current layout)
  2dus   — codes merged along D (B, KV, 2D, 1), scales merged (B, KV, 2, 1)
  2dus+slice — 2dus + re-reading the K half as a dot operand each layer
           (does the static slice of the merged buffer cost a copy?)

Usage: python experiments/exp_fresh_write.py [--batch 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L, KV, D = 16, 8, 64


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

    B, W = args.batch, args.steps
    rng = np.random.default_rng(0)

    def dus(buf, upd, li, t):
        return jax.lax.dynamic_update_slice(
            buf, upd, (li, 0, 0, 0, t))

    def make(mode):
        @jax.jit
        def run(x0, bufs):
            def step(carry, t):
                x, bs = carry

                def layer(c2, li):
                    x2, bs2 = c2
                    # fake per-layer K/V from the carry (data-dependent)
                    kc = (x2[:, :KV * D].reshape(B, KV, D, 1) * 127)\
                        .astype(jnp.int8)
                    vc = (x2[:, KV * D:2 * KV * D].reshape(B, KV, D, 1)
                          * 127).astype(jnp.int8)
                    ks = x2[:, :KV].reshape(B, KV, 1, 1)
                    vs = x2[:, KV:2 * KV].reshape(B, KV, 1, 1)
                    if mode == "4dus":
                        k, v, s1, s2 = bs2
                        k = dus(k, kc[None], li, t)
                        v = dus(v, vc[None], li, t)
                        s1 = dus(s1, ks[None], li, t)
                        s2 = dus(s2, vs[None], li, t)
                        bs2 = (k, v, s1, s2)
                        probe = k[li, :, :, :, :].astype(jnp.float32)
                    else:
                        kvb, sb = bs2
                        kvb = dus(kvb, jnp.concatenate([kc, vc], axis=2)[None],
                                  li, t)
                        sb = dus(sb, jnp.concatenate([ks, vs], axis=2)[None],
                                 li, t)
                        bs2 = (kvb, sb)
                        if mode == "2dus+slice":
                            probe = kvb[li, :, :, :D, :].astype(jnp.float32)
                        else:
                            probe = kvb[li, :, :, 0, :].astype(jnp.float32)
                    # chain through a max so the write isn't dead
                    m = jnp.max(probe)
                    x2 = x2 * 0.999 + 0.001 * m / (1.0 + jnp.abs(m))
                    return (x2, bs2), None

                (x, bs), _ = jax.lax.scan(layer, (x, bs), jnp.arange(L))
                return (x, bs), None

            (x, bs), _ = jax.lax.scan(step, (x0, bufs), jnp.arange(W))
            return x

        if mode == "4dus":
            bufs = (jnp.zeros((L, B, KV, D, W), jnp.int8),
                    jnp.zeros((L, B, KV, D, W), jnp.int8),
                    jnp.zeros((L, B, KV, 1, W), jnp.float32),
                    jnp.zeros((L, B, KV, 1, W), jnp.float32))
        else:
            bufs = (jnp.zeros((L, B, KV, 2 * D, W), jnp.int8),
                    jnp.zeros((L, B, KV, 2, W), jnp.float32))
        return run, bufs

    variants = {}
    for mode in ("4dus", "2dus", "2dus+slice"):
        run, bufs = make(mode)
        x0 = jnp.asarray(rng.normal(size=(B, 2 * KV * D)).astype(np.float32))
        t0 = time.perf_counter()
        jax.device_get(run(x0, bufs)[:1, :8])
        jax.device_get(run(x0 + 0.5, bufs)[:1, :8])
        print(f"compiled {mode} in {time.perf_counter()-t0:.0f}s", flush=True)
        variants[mode] = dict(run=run, bufs=bufs, times=[])

    for r in range(args.rounds):
        for mode, v in variants.items():
            x0 = jnp.asarray(rng.normal(size=(B, 2 * KV * D))
                             .astype(np.float32)) + r
            jax.device_get(x0[:1, :8])
            t0 = time.perf_counter()
            jax.device_get(v["run"](x0, v["bufs"])[:1, :8])
            dt = (time.perf_counter() - t0) / args.steps * 1e3
            v["times"].append(dt)
            print(f"round {r} {mode:12s} {dt:6.3f} ms/step", flush=True)

    print(json.dumps({m: round(min(v["times"]), 3)
                      for m, v in variants.items()}))


if __name__ == "__main__":
    main()
