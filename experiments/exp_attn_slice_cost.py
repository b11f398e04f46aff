"""Does the traced per-layer cache slice (cache.k[li] inside the decode
scan) cost a materialized HBM copy in the XLA int8-codes attention?

Interleaved same-run, 16-layer x 32-pass scans at flagship decode shapes:

  sliced    — kc[li] / vc[li] with li as scan xs (the serving pattern)
  presliced — unrolled 16 layers, per-layer arrays as separate jit args
              (no slicing at all)

If presliced << sliced, the slice-copy dominates the attention overhang
(2.26 ms vs ~1.1 ms DMA floor in the r3 bench budget) and a zero-copy
scalar-prefetch attention kernel is justified; if they are close, XLA
already elides/overlaps the copy and the overhang is compute/structure.
"""
import json
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

    B, KV, r, D, S, L, OUT = 128, 8, 4, 64, 256, 16, 32
    scale = D ** -0.5
    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8))
    vc = jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (L, B, KV, 1, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (L, B, KV, 1, S)).astype(np.float32))
    lengths = jnp.full((B,), S - 2, jnp.int32)

    def row_quant(x):
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s = jnp.maximum(absmax / 127.0, 1e-8)
        return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s

    def codes_attn(q, k, v, kss, vss):
        qi, qs = row_quant(q)
        s32 = jax.lax.dot_general(
            qi, k, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qs * kss * scale
        ids = jnp.arange(S)[None, None, None, :]
        s = jnp.where(ids <= lengths[:, None, None, None], s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        pv = p * vss
        pi, ps = row_quant(pv)
        o32 = jax.lax.dot_general(
            pi, v, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)
        return o32.astype(jnp.float32) * ps

    @jax.jit
    def f_sliced(q0, kc, vc, ks, vs):
        def outer(i, q):
            def layer(q, li):
                o = codes_attn(q, kc[li], vc[li], ks[li], vs[li])
                return (o / (1.0 + jnp.max(jnp.abs(o)))).astype(q.dtype), None
            q, _ = jax.lax.scan(layer, q, jnp.arange(L))
            return q
        return jax.lax.fori_loop(0, OUT, outer, q0)

    @jax.jit
    def f_presliced(q0, kl, vl, ksl, vsl):
        def outer(i, q):
            for k, v, a, b in zip(kl, vl, ksl, vsl):
                o = codes_attn(q, k, v, a, b)
                q = (o / (1.0 + jnp.max(jnp.abs(o)))).astype(q.dtype)
            return q
        return jax.lax.fori_loop(0, OUT, outer, q0)

    kl = [kc[i] for i in range(L)]
    vl = [vc[i] for i in range(L)]
    ksl = [ks[i] for i in range(L)]
    vsl = [vs[i] for i in range(L)]

    fns = {"sliced": lambda q: f_sliced(q, kc, vc, ks, vs),
           "presliced": lambda q: f_presliced(q, kl, vl, ksl, vsl)}

    def run(f):
        q = jnp.asarray(rng.normal(size=(B, KV, r, D)).astype(np.float32))
        jax.device_get(q[:1, :1, :1, :8])
        t0 = time.perf_counter()
        jax.device_get(f(q)[:1, :1, :1, :8])
        return (time.perf_counter() - t0) / (OUT * L) * 1e6  # us/layer

    for f in fns.values():
        run(f); run(f)                     # compile + first-exec warm
    out = {}
    for _ in range(3):
        for name, f in fns.items():
            out.setdefault(name, []).append(round(run(f), 1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
