"""Round 2 of honest measurements.

- bf16 dot with a sum-dependency (y[:, :1] deps get slice-pushed INTO the
  matmul by XLA -> only one output column computed; sum(y) can't be).
- int4 kernel unpack variants: current int32 mask/sub, biased (skip subs,
  correct with 8*sum(x_g) outside), int16-domain.
- decode: per-step dispatch vs K steps inside one jitted scan (greedy
  argmax feedback) -> quantifies tunnel dispatch latency.
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LENGTHS = (64, 128, 256)


def scan_time(body, x0, w, length, reps=2):
    """Every rep gets a UNIQUE carry (x0+rep) — the tunnel serves repeated
    identical dispatches from a cache, flattening naive timings to ~0."""
    @jax.jit
    def run(x, w):
        return jax.lax.scan(lambda c, _: (body(c, w), None), x, length=length)[0]

    out = run(x0, w)   # compile
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(reps):
        xr = x0 + (r + 1) * jnp.asarray(0.001, x0.dtype)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        out = run(xr, w)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def measure(name, body, x0, w, nbytes=None):
    ts = [scan_time(body, x0, w, n) for n in LENGTHS]
    per = (ts[-1] - ts[0]) / (LENGTHS[-1] - LENGTHS[0])
    mid = (ts[1] - ts[0]) / (LENGTHS[1] - LENGTHS[0])
    msg = f"  {name:44s} {per*1e6:9.1f} us/step (mid {mid*1e6:.1f})"
    if nbytes:
        msg += f"   {nbytes/per/1e9:7.0f} GB/s"
    print(msg)
    return per


def dep(x, y):
    # consume EVERY element of y so XLA cannot slice-push into the matmul
    return x + (jnp.sum(y, axis=-1, keepdims=True) * 1e-12).astype(x.dtype)


# --- int4 kernel variants ----------------------------------------------------

def _cdiv(a, b):
    return -(-a // b)


def kern_biased(x_ref, wp_ref, st_ref, xs_ref, out_ref, acc, *, group, tk, nk):
    k = pl.program_id(2)
    gpk = tk // group
    half = group // 2

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    wp = wp_ref[...].astype(jnp.int32)
    for gi in range(gpk):
        b = wp[:, gi * half:(gi + 1) * half]
        lo = (b & 0xF).astype(jnp.int8)
        hi = (b >> 4).astype(jnp.int8)
        xlo = x_ref[:, gi * group: gi * group + half]
        xhi = x_ref[:, gi * group + half: (gi + 1) * group]
        part = jax.lax.dot_general(xlo, lo, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        part += jax.lax.dot_general(xhi, hi, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        acc[...] += ((part.astype(jnp.float32) - xs_ref[:, gi][:, None])
                     * st_ref[gi, :][None, :])

    @pl.when(k == nk - 1)
    def _():
        out_ref[...] = acc[...]


def kern_i16(x_ref, wp_ref, st_ref, out_ref, acc, *, group, tk, nk):
    k = pl.program_id(2)
    gpk = tk // group
    half = group // 2

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    wp = wp_ref[...].astype(jnp.int16)
    for gi in range(gpk):
        b = wp[:, gi * half:(gi + 1) * half]
        lo = ((b & jnp.int16(0xF)) - jnp.int16(8)).astype(jnp.int8)
        hi = ((b >> 4) - jnp.int16(8)).astype(jnp.int8)
        xlo = x_ref[:, gi * group: gi * group + half]
        xhi = x_ref[:, gi * group + half: (gi + 1) * group]
        part = jax.lax.dot_general(xlo, lo, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        part += jax.lax.dot_general(xhi, hi, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        acc[...] += part.astype(jnp.float32) * st_ref[gi, :][None, :]

    @pl.when(k == nk - 1)
    def _():
        out_ref[...] = acc[...]


def make_variant(kern, M, N, C, group, tn, tk, biased=False):
    nk = C // tk
    gpk = tk // group

    @jax.jit
    def call(x_i8, wp, st, xs=None):
        in_specs = [
            pl.BlockSpec((M, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tk // 2), lambda i, j, k: (j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpk, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ]
        args = [x_i8, wp, st]
        if biased:
            in_specs.append(pl.BlockSpec((M, gpk), lambda i, j, k: (i, k),
                                         memory_space=pltpu.VMEM))
            args.append(xs)
        return pl.pallas_call(
            partial(kern, group=group, tk=tk, nk=nk),
            grid=(1, _cdiv(N, tn), nk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(flops=2 * M * N * C,
                                          bytes_accessed=N * C // 2 + M * C,
                                          transcendentals=0),
        )(*args)

    return call


def main():
    print(f"backend={jax.default_backend()}  (scan slopes {LENGTHS}, sum-dep)")
    rng = np.random.default_rng(0)
    from llm_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
    from llm_compressor_tpu.qformats.config import parse_qspec
    from llm_compressor_tpu.qformats.qtensor import quantize_pack

    M, group = 32, 128
    for (N, C, tag) in [(8192, 2048, "gate/up"), (128256, 2048, "head")]:
        print(f"shape ({M}x{C}) @ ({N}x{C})^T  [{tag}]")
        wreal = jnp.asarray(rng.standard_normal((N, C)) * 0.02, jnp.bfloat16)
        x0 = jnp.asarray(rng.standard_normal((M, C)), jnp.bfloat16)

        measure("bf16 dot (sum dep)", lambda x, w: dep(x, jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())))), x0, wreal, nbytes=N * C * 2)

        qt4 = quantize_pack(parse_qspec("int4-g[128]-rw"), wreal)
        measure("w4a8 int4 current", lambda x, w: dep(x, w4a8_matmul(x, w)),
                x0, qt4, nbytes=N * C // 2)

        G = C // group
        tn = 1024
        tk = 2048 if C % 2048 == 0 else C
        wp = qt4.codes.reshape(N, C // 2)
        st = qt4.scales.reshape(N, G).T.copy()

        vb = make_variant(kern_biased, M, N, C, group, tn, tk, biased=True)

        def body_biased(x, w):
            wp_, st_ = w
            xi8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 4), -127, 127).astype(jnp.int8)
            xs = 8.0 * jnp.sum(
                xi8.reshape(M, G, group).astype(jnp.int32), axis=2).astype(jnp.float32)
            return dep(x, vb(xi8, wp_, st_, xs))

        measure("w4a8 int4 biased-unpack", body_biased, x0, (wp, st),
                nbytes=N * C // 2)

        # int16 unpack: arith.shrsi on vector<i16> unimplemented in Mosaic.

    # --- decode: dispatch-chained vs scan-inside-jit -----------------------
    from llm_compressor_tpu.algorithms import pack_model, rtn
    from llm_compressor_tpu.engine import decode_step, init_cache
    from llm_compressor_tpu.engine.generate import _forward_cached
    from llm_compressor_tpu.models import fuse_model, init_params, stack_model
    from llm_compressor_tpu.qformats import build_quant_config
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None, None)
    B = 32

    def scan_decode(params, qc, n):
        @jax.jit
        def run(p, tok, cache):
            def body(carry, _):
                tok, cache = carry
                logits, cache = _forward_cached(p, cfg, tok, cache, None, qc)
                cache = cache.replace(lengths=cache.lengths + 1)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
                return (nxt, cache), ()
            (tok, cache), _ = jax.lax.scan(body, (tok, cache), length=n)
            return tok, cache
        return run

    for label, qc, prep in [
        ("bf16", None, lambda p: stack_model(fuse_model(
            jax.tree_util.tree_map(lambda x: x, p), cfg, None))),
        ("w4a8", qcfg, None),
    ]:
        params = init_params(cfg, jax.random.PRNGKey(0))
        if label == "w4a8":
            rtn(params, cfg, qc)
            pack_model(params, cfg, qc)
            sp = stack_model(fuse_model(params, cfg, qc))
        else:
            sp = prep(params)
        del params

        rngl = np.random.default_rng(1)
        tok = jnp.asarray(rngl.integers(0, cfg.vocab_size, (B, 1)).astype(np.int32))

        def fresh_cache():
            c = init_cache(cfg.num_layers, B, 512, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
            return c.replace(lengths=jnp.full((B,), 128, jnp.int32))

        # dispatch-chained
        cache = fresh_cache()
        step = partial(decode_step, cfg=cfg, qcfg=qc)
        for _ in range(6):
            logits, cache = step(sp, tok, cache)
        logits.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(32):
            logits, cache = step(sp, tok, cache)
        logits.block_until_ready()
        dt = (time.perf_counter() - t0) / 32
        print(f"  decode {label} dispatch-chained           {dt*1e3:8.2f} ms/step  {B/dt:7.0f} tok/s")

        # scan-in-jit, diff 8 -> 32 (unique token per rep: dedup guard)
        times = {}
        for n in (8, 32):
            run = scan_decode(sp, qc, n)
            out = run(sp, tok, fresh_cache())
            jax.block_until_ready(out)
            best = float("inf")
            for r in range(3):
                cache = fresh_cache()
                tok_r = jnp.asarray(
                    rngl.integers(0, cfg.vocab_size, (B, 1)).astype(np.int32))
                jax.block_until_ready((cache, tok_r))
                t0 = time.perf_counter()
                out = run(sp, tok_r, cache)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        per = (times[32] - times[8]) / 24
        print(f"  decode {label} scan-in-jit (diff 8->32)   {per*1e3:8.2f} ms/step  {B/per:7.0f} tok/s")
        del sp


if __name__ == "__main__":
    main()
