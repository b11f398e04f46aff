"""Transposed-dot probe: stream the WIDE (N) operand through the MXU.

Round-5 state: every W4A8 kernel sits at ~1.5-2.4x its DMA/compute floor
(exp_plane_probe: qkv 13.2 us vs ~6.2 bf16-DMA floor; gateup 52.7 vs ~27;
down 32.5 vs ~13.5; head8k int8 plain dot1 41.3 us = 419 GB/s vs bf16's
538 GB/s byte rate). The consistent factor matches the MXU fill model at
decode M: every (TM=128, K) x (K, TN) dot loads K/128 * TN/128 stationary
tiles and streams only M=128 rows through each — fill (~128 cy) is paid
once per stationary tile and amortized over only 128 stream rows, i.e.
<= 50% MXU occupancy, and int8's 2x stream rate makes fill RELATIVELY
worse (measured int8/bf16 wall ratio 1.5x, not 2x).

Hypothesis: express each per-group dot TRANSPOSED —
    part^T (TN, TM) = dot(plane_g (TN, K=g), x_g (TM, K=g))
so the STATIONARY operand is the tiny x block (one 128x128 tile per
group) and the wide plane STREAMS TN rows through it: fill amortizes over
TN=1024 rows instead of M=128. Scales apply as (TN, 1) columns from a
non-transposed (N, G) scale block; the pair-planes lo-bias correction
transposes the same way (one narrow (TN, hp) x (TM, hp) f32 dot).

Variants per shape (same in-graph chained-scan harness as
exp_plane_probe; all feed pre-quantized int8 acts):
  kernel  — the real w4a8_matmul today (pair-planes, M-streamed dots)
  tdot    — transposed dots, output stays (N, M) (no epilogue transpose;
            measures the pure MXU-orientation effect)
  tdot_tr — transposed dots + in-kernel epilogue transpose back to
            (M, N) (what a drop-in kernel replacement must pay unless
            the consumer takes y^T)
head8k runs the same three for the int8 path (no unpack).
"""

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
        w4a8_matmul, _round_up, _pick_tk)
    from llm_compressor_tpu.qformats import build_quant_config, quantize_pack

    M = 128
    GROUP = 128
    SHAPES = [  # (name, C, N, iters, int4)
        ("qkv", 2048, 3072, 16384, True),
        ("gateup", 2048, 16384, 4096, True),
        ("down", 8192, 2048, 4096, True),
        ("head8k", 2048, 8192, 4096, False),
    ]
    rng = np.random.default_rng(0)

    def tdot_kernel(x_ref, wp_ref, stc_ref, sce_ref, out_ref, acc, *,
                    mode, group, tk, nk, int4):
        """Transposed per-group dots: acc is (TN, TM) f32.

        x (TM, tk) i8; wp (TN, tk/2) u8 pair-planes / (TN, tk) i8;
        stc (1, TN, gpk) f32 scale block (group on LANES, n on sublanes;
        leading dim indexes the k block so the lane dim is always full);
        sce (1, TN, gpk/2) f32 even-group scales (int4 lo-bias corr).
        """
        k = pl.program_id(2)
        gpk = tk // group
        hp = gpk // 2
        x = x_ref[...]
        total = None
        if int4:
            P = wp_ref[...]
            L = jax.lax.bitcast_convert_type(P & 0x0F, jnp.int8)
            H = jax.lax.bitcast_convert_type((P ^ 0x80) & 0xF0, jnp.int8)
            for gi in range(gpk):
                t, odd = divmod(gi, 2)
                plane = H if odd else L
                part = jax.lax.dot_general(
                    plane[:, t * group:(t + 1) * group],
                    x[:, gi * group:(gi + 1) * group],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)        # (TN, TM)
                sc = stc_ref[0, :, gi:gi + 1]                # (TN, 1)
                c = part.astype(jnp.float32) * (sc * 0.0625 if odd else sc)
                total = c if total is None else total + c
            # lo-bias: total -= 8 * (sce (TN,hp) . s_e (TM,hp)^T)
            tk_ = gpk * group
            kidx = jax.lax.broadcasted_iota(jnp.int32, (tk_, hp), 0)
            tsel = jax.lax.broadcasted_iota(jnp.int32, (tk_, hp), 1)
            ind = ((kidx // group) % 2 == 0) & ((kidx // (2 * group)) == tsel)
            e_ind = jnp.where(ind, 1, 0).astype(jnp.int8)    # (tk, hp)
            s_e = jax.lax.dot_general(
                x, e_ind, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)            # (TM, hp)
            corr = jax.lax.dot_general(
                sce_ref[0], s_e.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (TN, TM)
            total = total - 8.0 * corr
        else:
            W = wp_ref[...]                                  # (TN, tk) i8
            for gi in range(gpk):
                part = jax.lax.dot_general(
                    W[:, gi * group:(gi + 1) * group],
                    x[:, gi * group:(gi + 1) * group],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                c = part.astype(jnp.float32) * stc_ref[0, :, gi:gi + 1]
                total = c if total is None else total + c

        @pl.when(k == 0)
        def _():
            acc[...] = total

        @pl.when(k > 0)
        def _():
            acc[...] += total

        @pl.when(k == nk - 1)
        def _():
            if mode == "tdot_tr":
                out_ref[...] = acc[...].T.astype(out_ref.dtype)
            else:
                out_ref[...] = acc[...].astype(out_ref.dtype)

    def make_tdot(mode, wp_np, scales_np, C, N, iters, int4):
        tk = _pick_tk(C, GROUP, pairs=int4)
        nk = C // tk
        gpk = tk // GROUP
        tm = 128
        tn = 1024 if N % 1024 == 0 else 512
        wp = jnp.asarray(wp_np)
        # (nk, N, gpk): leading dim = k block, so the scale BlockSpec's
        # trailing lane dim is always the full gpk (Mosaic tiling rule)
        stc = jnp.asarray(np.ascontiguousarray(
            scales_np.reshape(N, nk, gpk).transpose(1, 0, 2)))
        sce = jnp.asarray(np.ascontiguousarray(
            scales_np[:, 0::2].reshape(N, nk, gpk // 2).transpose(1, 0, 2)))

        transposed_out = mode == "tdot"
        out_shape = ((N, _round_up(M, tm)) if transposed_out
                     else (_round_up(M, tm), N))
        out_spec = (pl.BlockSpec((tn, tm), lambda i, j, k: (j, i),
                                 memory_space=pltpu.VMEM)
                    if transposed_out else
                    pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                                 memory_space=pltpu.VMEM))

        def call(x_i8, wp, stc, sce):
            return pl.pallas_call(
                partial(tdot_kernel, mode=mode, group=GROUP, tk=tk, nk=nk,
                        int4=int4),
                grid=(-(-M // tm), -(-N // tn), nk),
                in_specs=[
                    pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, tk // 2 if int4 else tk),
                                 lambda i, j, k: (j, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tn, gpk), lambda i, j, k: (k, j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tn, gpk // 2),
                                 lambda i, j, k: (k, j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((tn, tm), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")),
            )(x_i8, wp, stc, sce)

        @jax.jit
        def run(x0, wp, stc, sce):
            def step(x, _):
                xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 64),
                              -127, 127).astype(jnp.int8)
                y = call(xi, wp, stc, sce)
                m = jnp.max(y.astype(jnp.float32))
                xn = (x.astype(jnp.float32) * 0.999
                      + 0.001 * m / (1.0 + jnp.abs(m))).astype(jnp.bfloat16)
                return xn, None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x

        return lambda x0: run(x0, wp, stc, sce), call

    def make_real(qt, iters):
        @jax.jit
        def run(x0, qt):
            def step(x, _):
                xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 64),
                              -127, 127).astype(jnp.int8)
                y = w4a8_matmul(xi.astype(jnp.bfloat16), qt)
                m = jnp.max(y.astype(jnp.float32))
                xn = (x.astype(jnp.float32) * 0.999
                      + 0.001 * m / (1.0 + jnp.abs(m))).astype(jnp.bfloat16)
                return xn, None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x
        return lambda x0: run(x0, qt)

    runs = []
    for name, C, N, iters, int4 in SHAPES:
        fmt = "int4" if int4 else "int8"
        q = build_quant_config(f"{fmt}-g[{GROUP}]-rw", None, None, None)
        W = rng.normal(size=(N, C)).astype(np.float32) * 0.02
        qt = quantize_pack(q.linear.weight, jnp.asarray(W))
        codes_np = np.asarray(qt.codes)
        scales_np = np.asarray(qt.scales).reshape(N, C // GROUP)
        pbytes = codes_np.nbytes + scales_np.nbytes
        x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)

        fn_t, call_t = make_tdot("tdot", codes_np, scales_np, C, N, iters,
                                 int4)
        fn_tt, _ = make_tdot("tdot_tr", codes_np, scales_np, C, N, iters,
                             int4)

        # numerics: tdot output (N, M) must match the real kernel's (M, N)
        xi = np.clip(np.round(np.asarray(x0, np.float32) * 64), -127, 127)
        ref = np.asarray(
            w4a8_matmul(jnp.asarray(xi, jnp.bfloat16), qt), np.float32)
        tk_ = _pick_tk(C, GROUP, pairs=int4)
        nk_, gpk_ = C // tk_, tk_ // GROUP
        stc_np = np.ascontiguousarray(
            scales_np.reshape(N, nk_, gpk_).transpose(1, 0, 2))
        sce_np = np.ascontiguousarray(
            scales_np[:, 0::2].reshape(N, nk_, gpk_ // 2).transpose(1, 0, 2))
        got = np.asarray(call_t(jnp.asarray(xi, jnp.int8),
                                jnp.asarray(codes_np),
                                jnp.asarray(stc_np),
                                jnp.asarray(sce_np)),
                         np.float32).T[:M, :N]
        # the real kernel folds the act scale (=1 path differs); compare
        # against the same integer math: rescale ref by its sx
        err = np.max(np.abs(got * (np.abs(ref).max() / max(
            np.abs(got).max(), 1e-9)) - ref)) / (np.abs(ref).max() + 1e-9)
        print(f"{name}: tdot scaled rel-err vs kernel = {err:.2e}",
              flush=True)

        runs.append((f"{name}/kernel", make_real(qt, iters), x0, pbytes,
                     iters))
        runs.append((f"{name}/tdot", fn_t, x0, pbytes, iters))
        runs.append((f"{name}/tdot_tr", fn_tt, x0, pbytes, iters))

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
            print(f"  {name:18s} {per:9.1f} us/call  {gbs:7.1f} GB/s(w)"
                  f"  [{dt*1e3:6.0f} ms total]", flush=True)


if __name__ == "__main__":
    main()
