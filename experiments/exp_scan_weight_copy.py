"""Does lax.scan's xs-slicing COPY the packed weights every decode step?

The decode scan feeds each layer's weights as scan xs; XLA lowers that to a
dynamic-slice per iteration, and a Pallas custom call needs a dense operand
buffer — if the slice materializes, every step re-copies ~0.5 GB of packed
codes HBM->HBM before the kernel reads them (~+1.9 ms/step at stream speed,
which is the size of the bench's glue+matmul overhang).

Interleaved same-run ms/step for a 16-layer x 4-matmul body (the flagship's
exact fused shapes, real packed QTensors, silu glue) driven by a 32-step
outer scan:

  xs       — weights ride the inner scan as xs (the serving pattern today)
  indexed  — weights captured invariant, sliced with dynamic_index_in_dim
  unrolled — inner Python loop, per-layer weights as separate jit args
             (no slicing at all: the Pallas kernels read the arg buffers)

If unrolled << xs ~= indexed, the slice-copy is real and the fix is a
stacked-weight kernel (scalar-prefetch layer index, zero-copy DMA).
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

    from __graft_entry__ import _flagship_cfg
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.models import fuse_model, init_params
    from llm_compressor_tpu.models.transformer import stack_layers
    from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
    from llm_compressor_tpu.qformats import build_quant_config

    on_tpu = jax.default_backend() == "tpu"
    cfg = _flagship_cfg(tiny=not on_tpu)
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)
    params = fuse_model(params, cfg, qcfg)

    E = cfg.hidden_size
    per_layer = [
        {k: lp[grp][name]["weight"] for k, (grp, name) in
         {"qkv": ("attn", "qkv_cat"), "o": ("attn", "o"),
          "gateup": ("mlp", "gateup"), "down": ("mlp", "down")}.items()}
        for lp in params["layers"]
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)

    B, steps, L = 128, 32, cfg.num_layers
    I = cfg.intermediate_size

    def body4(h, w):
        y = w4a8_matmul(h, w["qkv"])[:, :E]
        y = w4a8_matmul(y, w["o"])
        gu = w4a8_matmul(y, w["gateup"])
        m = jax.nn.silu(gu[:, :I]) * gu[:, I:]
        return w4a8_matmul(m, w["down"])

    def make_xs():
        @jax.jit
        def f(h0, ws):
            def outer(h, _):
                def inner(hh, w):
                    return body4(hh, w), None
                h, _ = jax.lax.scan(inner, h, ws)
                return h / (1.0 + jnp.abs(h).max()), None
            h, _ = jax.lax.scan(outer, h0, length=steps)
            return h
        return lambda h0: f(h0, stacked)

    def make_indexed():
        @jax.jit
        def f(h0, ws):
            def outer(h, _):
                def inner(hh, i):
                    w = jax.tree_util.tree_map(
                        lambda x: jax.lax.dynamic_index_in_dim(
                            x, i, 0, keepdims=False), ws)
                    return body4(hh, w), None
                h, _ = jax.lax.scan(inner, h, jnp.arange(L))
                return h / (1.0 + jnp.abs(h).max()), None
            h, _ = jax.lax.scan(outer, h0, length=steps)
            return h
        return lambda h0: f(h0, stacked)

    def make_unrolled():
        @jax.jit
        def f(h0, wl):
            def outer(h, _):
                for w in wl:
                    h = body4(h, w)
                return h / (1.0 + jnp.abs(h).max()), None
            h, _ = jax.lax.scan(outer, h0, length=steps)
            return h
        return lambda h0: f(h0, per_layer)

    variants = [("xs", make_xs()), ("indexed", make_indexed()),
                ("unrolled", make_unrolled())]
    rng = np.random.default_rng(0)

    def run(fn):
        h0 = jnp.asarray(rng.normal(size=(B, E)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        jax.device_get(h0[:1, :8])            # fresh values, queue drained
        t0 = time.perf_counter()
        jax.device_get(fn(h0)[:1, :8])        # device_get completion barrier
        return (time.perf_counter() - t0) / steps * 1e3

    for _, fn in variants:                    # compile (untimed)
        run(fn)
    out = {}
    for _ in range(3):                        # interleaved timed rounds
        for name, fn in variants:
            out.setdefault(name, []).append(round(run(fn), 3))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
