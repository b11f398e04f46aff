"""Validate the 'tile planes' int4 layout before changing the packing.

Round-5 dissect (exp_kernel_dissect_r5.log) decomposed the int4 kernel's
gap to the bf16 DMA-rate floor (qkv shape, us/call, M=128):

    DMA floor at bf16 rate   ~6.2
    unpack1 (int32 unpack + ONE big dot, no groups)   11.4
    real kernel (unpack + 16 concats + 16 K=g dots + scales)  14.8

i.e. ~3.4us is the per-group concat/split machinery and ~4us the int32
round-trip unpack. The 'hybrid' A/B that concluded "MXU-pass-bound" kept
the per-group concats — the concat was the cost, not the unpack mode.

Hypothesis: pack nibbles as TILE PLANES (byte j of a K-tile holds elems
(j, j + tk/2), i.e. group pairs (g, g + gpk/2)) instead of GROUP halves
(elems (i, i + g/2)). Then:
  lo plane  = bitcast_i8(P & 0x0F)        = lo + 8   -> groups 0..gpk/2-1
  hi plane  = bitcast_i8((P ^ 0x80) & 0xF0) = 16*hi  -> groups gpk/2..gpk-1
and EVERY per-group dot is a contiguous K=g slice of a plane: no concats,
no K=g/2 half-depth dots (the xor-mode loss), 3 byte-ops of unpack total.
The +8 lo bias folds into one narrow (TM,gpk/2)@(gpk/2,TN) f32 epilogue
dot; the 16x hi factor folds into the group scales (exact: 16*d < 2^24).

Variants (per shape, same in-graph scan harness as exp_kernel_dissect):
  kernel    — the real w4a8_matmul today (group-halves layout)
  plane     — tile-planes layout, byte-op unpack (the proposal)
  plane_i32 — tile-planes layout, int32-roundtrip unpack (isolates the
              concat elimination from the byte-op unpack)
Numerics are validated against the f32 reference of the SAME quantized
values (plane repack is a column permutation of the same codes).
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
    SHAPES = [  # (name, C, N, iters)
        ("qkv", 2048, 3072, 16384),
        ("gateup", 2048, 16384, 4096),
        ("down", 8192, 2048, 4096),
    ]
    rng = np.random.default_rng(0)

    def plane_kernel(x_ref, wp_ref, st_ref, out_ref, acc, *, mode, group,
                     tk, nk):
        """tile-planes unpack + contiguous K=group dots.

        wp (TN, tk/2) u8: byte j = elems (j, j + tk/2) of this K tile.
        st (gpk, TN) f32: hi-plane group rows PRE-DIVIDED by 16 (mode
        'plane'), plain scales (mode 'plane_i32')."""
        k = pl.program_id(2)
        gpk = tk // group
        hp = gpk // 2
        P = wp_ref[...]
        if mode == "plane":
            L = jax.lax.bitcast_convert_type(P & 0x0F, jnp.int8)   # lo + 8
            H = jax.lax.bitcast_convert_type((P ^ 0x80) & 0xF0, jnp.int8)
        else:
            p32 = P.astype(jnp.int32)
            L = ((p32 & 0xF) - 8).astype(jnp.int8)                 # lo
            H = ((p32 >> 4) - 8).astype(jnp.int8)                  # hi
        total = None
        for gi in range(gpk):
            plane = L if gi < hp else H
            col = (gi if gi < hp else gi - hp) * group
            part = jax.lax.dot_general(
                x_ref[:, gi * group:(gi + 1) * group],
                plane[:, col:col + group],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            c = part.astype(jnp.float32) * st_ref[gi, :][None, :]
            total = c if total is None else total + c
        if mode == "plane":
            # -8 bias correction for the lo plane: sum_g 8*rowsum(x_g)*st_g
            # == 8 * (s_lo @ st_lo) as ONE narrow f32 dot.
            xi = x_ref[...].astype(jnp.float32)
            s_lo = jnp.stack(
                [jnp.sum(xi[:, gi * group:(gi + 1) * group], axis=1)
                 for gi in range(hp)], axis=1)                     # (TM, hp)
            corr = jax.lax.dot_general(
                s_lo, st_ref[:hp, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            total = total - 8.0 * corr

        @pl.when(k == 0)
        def _():
            acc[...] = total

        @pl.when(k > 0)
        def _():
            acc[...] += total

        @pl.when(k == nk - 1)
        def _():
            out_ref[...] = acc[...].astype(out_ref.dtype)

    def repack_planes(codes_np, N, C, tk):
        """group-halves packed (N, C/2) u8 -> tile-planes packed (N, C/2).

        Unpack to per-element int4 values first (authoritative), then pack
        byte j of tile tb = elems (tb*tk + j, tb*tk + j + tk/2)."""
        lo = (codes_np & 0xF).astype(np.int16) - 8
        hi = (codes_np >> 4).astype(np.int16) - 8
        g = GROUP
        half = g // 2
        vals = np.zeros((N, C), np.int16)
        ng = C // g
        for gi in range(ng):
            vals[:, gi * g:gi * g + half] = lo[:, gi * half:(gi + 1) * half]
            vals[:, gi * g + half:(gi + 1) * g] = hi[:, gi * half:(gi + 1) * half]
        nt = C // tk
        ht = tk // 2
        out = np.zeros((N, C // 2), np.uint8)
        for tb in range(nt):
            a = vals[:, tb * tk: tb * tk + ht] + 8          # lo nibble
            b = vals[:, tb * tk + ht:(tb + 1) * tk] + 8     # hi nibble
            out[:, tb * ht:(tb + 1) * ht] = (a | (b << 4)).astype(np.uint8)
        return out, vals

    def make_plane(mode, wp_planes, st_t, C, N, iters):
        tk = _pick_tk(C, GROUP)
        nk = C // tk
        gpk = tk // GROUP
        tm = 128
        tn = 1024 if N % 1024 == 0 else 512
        wp = jnp.asarray(wp_planes)
        st = jnp.asarray(st_t)  # (C/g, N) f32, hi rows maybe pre-divided

        def call(x_i8, wp, st):
            return pl.pallas_call(
                partial(plane_kernel, mode=mode, group=GROUP, tk=tk, nk=nk),
                grid=(-(-M // tm), -(-N // tn), nk),
                in_specs=[
                    pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, tk // 2), lambda i, j, k: (j, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gpk, tn), lambda i, j, k: (k, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((_round_up(M, tm), N),
                                               jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")),
            )(x_i8, wp, st)

        @jax.jit
        def run(x0, wp, st):
            def step(x, _):
                xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 64),
                              -127, 127).astype(jnp.int8)
                y = call(xi, wp, st)
                m = jnp.max(y.astype(jnp.float32))
                xn = (x.astype(jnp.float32) * 0.999
                      + 0.001 * m / (1.0 + jnp.abs(m))).astype(jnp.bfloat16)
                return xn, None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x

        return lambda x0: run(x0, wp, st), call

    def make_real(qt, iters):
        @jax.jit
        def run(x0, qt):
            def step(x, _):
                xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 64),
                              -127, 127).astype(jnp.int8)
                # feed pre-quantized acts so all variants time the same work
                y = w4a8_matmul(xi.astype(jnp.bfloat16), qt)
                m = jnp.max(y.astype(jnp.float32))
                xn = (x.astype(jnp.float32) * 0.999
                      + 0.001 * m / (1.0 + jnp.abs(m))).astype(jnp.bfloat16)
                return xn, None
            x, _ = jax.lax.scan(step, x0, length=iters)
            return x
        return lambda x0: run(x0, qt)

    runs = []
    for name, C, N, iters in SHAPES:
        tk = _pick_tk(C, GROUP)
        gpk = tk // GROUP
        q = build_quant_config(f"int4-g[{GROUP}]-rw", None, None, None)
        W = rng.normal(size=(N, C)).astype(np.float32) * 0.02
        qt = quantize_pack(q.linear.weight, jnp.asarray(W))
        codes_np = np.asarray(qt.codes).reshape(N, C // 2)
        scales_np = np.asarray(qt.scales).reshape(N, C // GROUP)
        wp_planes, vals = repack_planes(codes_np, N, C, tk)
        # per-tile scale strips (C/g, N); hi-plane rows / 16 for 'plane'
        st_plain = scales_np.T.copy()                      # (C/g, N)
        st_div = st_plain.copy()
        ng_t = tk // GROUP
        for tb in range(C // tk):
            st_div[tb * ng_t + ng_t // 2:(tb + 1) * ng_t] /= 16.0
        x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                         jnp.bfloat16)
        pbytes = N * C // 2 + scales_np.nbytes

        # numerics check (CPU interpret would be slow; do it on-device once)
        fn_p, call_p = make_plane("plane", wp_planes, st_div, C, N, iters)
        fn_pi, _ = make_plane("plane_i32", wp_planes, st_plain, C, N, iters)
        xi = np.clip(np.round(np.asarray(x0, np.float32) * 64), -127, 127)
        ref = (xi @ (vals.astype(np.float32)
                     * np.repeat(scales_np, GROUP, 1)).T)
        got = np.asarray(call_p(jnp.asarray(xi, jnp.int8),
                                jnp.asarray(wp_planes),
                                jnp.asarray(st_div)), np.float32)[:M, :N]
        err = np.max(np.abs(got - ref) / (np.abs(ref).max() + 1e-9))
        print(f"{name}: plane rel-err vs f32 ref = {err:.2e}", flush=True)

        runs.append((f"{name}/kernel", make_real(qt, iters), x0, pbytes,
                     iters))
        runs.append((f"{name}/plane", fn_p, x0, pbytes, iters))
        runs.append((f"{name}/plane_i32", fn_pi, x0, pbytes, iters))

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
