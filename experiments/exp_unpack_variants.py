"""int4 unpack strategy A/B at flagship decode shapes (M=128, g=128).

The shipping kernel unpacks whole-tile lo/hi nibble planes then, per
group, CONCATENATES the two (TN, half) slices into a (TN, group) operand
for ONE K=group MXU dot. The concat is a per-group VMEM copy (~2 MB per
k-block). Variant 'split' skips it: two K=half dots per group against the
plane slices directly (group-halves packing pairs them with contiguous x
slices). int4 kernel ~208 GB/s-packed is compute-bound (CLAUDE.md) — this
decides whether the concat or the MXU passes are the binding cost.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from llm_compressor_tpu.kernels.w4a8_matmul import (
        _call, _cdiv, _round_up, quantize_acts_per_token)
    from llm_compressor_tpu.qformats import ElemFormat, Quantizer, quantize_pack

    M, g = 128, 128
    shapes = [("down", 2048, 8192), ("gateup", 16384, 2048)]
    reps = 48

    def split_kernel(x_ref, wp_ref, st_ref, sx_ref, out_ref, acc, *,
                     group, tk, nk):
        k = pl.program_id(2)
        gpk = tk // group
        half = group // 2
        x_i8 = x_ref[...]
        wp = wp_ref[...].astype(jnp.int32)
        lo = ((wp & 0xF) - 8).astype(jnp.int8)       # (TN, tk/2)
        hi = ((wp >> 4) - 8).astype(jnp.int8)
        total = None
        for gi in range(gpk):
            part = jax.lax.dot_general(
                x_i8[:, gi * group: gi * group + half],
                lo[:, gi * half:(gi + 1) * half],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            part += jax.lax.dot_general(
                x_i8[:, gi * group + half:(gi + 1) * group],
                hi[:, gi * half:(gi + 1) * half],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            c = part.astype(jnp.float32) * st_ref[gi, :][None, :]
            total = c if total is None else total + c

        @pl.when(k == 0)
        def _():
            acc[...] = total

        @pl.when(k > 0)
        def _():
            acc[...] += total

        @pl.when(k == nk - 1)
        def _():
            out_ref[...] = (acc[...] * sx_ref[...]).astype(out_ref.dtype)

    @partial(jax.jit, static_argnames=("group", "tm", "tn", "tk"))
    def call_split(x_i8, wp, scales_t, sx, *, group, tm, tn, tk):
        Mx, C = x_i8.shape
        N = wp.shape[0]
        nk = C // tk
        gpk = tk // group
        return pl.pallas_call(
            partial(split_kernel, group=group, tk=tk, nk=nk),
            grid=(_cdiv(Mx, tm), _cdiv(N, tn), nk),
            in_specs=[
                pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, tk // 2), lambda i, j, k: (j, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gpk, tn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, 1), lambda i, j, k: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((_round_up(Mx, tm), N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=jax.default_backend() != "tpu",
        )(x_i8, wp, scales_t, sx)

    rng = np.random.default_rng(0)
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=g)
    out = {}
    for name, N, C in shapes:
        qt = quantize_pack(q, jnp.asarray(
            rng.normal(0, 0.05, size=(N, C)).astype(np.float32)))
        wp, st = qt.codes, qt.scales_t
        tm, tk = 128, min(2048, C)
        tn = 1024
        x = rng.normal(size=(M, C)).astype(np.float32)
        xi, sx = quantize_acts_per_token(jnp.asarray(x))
        sx = sx.astype(jnp.float32)

        def mk(fn):
            @jax.jit
            def f(xi, sx, wp, st):
                def step(i, carry):
                    xi_c, acc = carry
                    y = fn(xi_c, wp, st, sx)
                    # feed a value-dependence back through the int8 input
                    d = jnp.max(jnp.abs(y)).astype(jnp.int32) % 3 - 1
                    return (jnp.clip(xi_c + d.astype(jnp.int8), -127, 127),
                            acc + jnp.max(jnp.abs(y)))
                _, acc = jax.lax.fori_loop(0, reps, step, (xi, 0.0))
                return acc
            return f

        fns = {
            f"{name}_concat": mk(lambda a, b, c, d: _call(
                a, b, c, d, group=g, int4=True, tm=tm, tn=tn, tk=tk)),
            f"{name}_split": mk(lambda a, b, c, d: call_split(
                a, b, c, d, group=g, tm=tm, tn=tn, tk=tk)),
        }

        # numeric parity first
        ya = _call(xi, wp, st, sx, group=g, int4=True, tm=tm, tn=tn, tk=tk)
        yb = call_split(xi, wp, st, sx, group=g, tm=tm, tn=tn, tk=tk)
        assert np.allclose(np.asarray(ya, np.float32),
                           np.asarray(yb, np.float32), atol=1e-2), name

        def run(f):
            x2 = jnp.asarray(rng.integers(-100, 100, (M, C)).astype(np.int8))
            jax.device_get(x2[:1, :8])
            t0 = time.perf_counter()
            jax.device_get(f(x2, sx, wp, st))
            return (time.perf_counter() - t0) / reps * 1e3

        for f in fns.values():
            run(f); run(f)
        for _ in range(3):
            for k, f in fns.items():
                out.setdefault(k, []).append(round(run(f), 3))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
