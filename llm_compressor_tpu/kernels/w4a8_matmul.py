"""Fused W4A8 matmul — int8 activations x int4/int8 weights on the MXU.

The dequantize-to-bf16 kernel (dequant_matmul.py) pays ~8 VPU ops per
weight element, which dominates decode where M is tiny. This kernel keeps
weights integer all the way into the MXU (v5e has native int8 matmul):

    y[m, n] = sx[m] * sum_g  s_w[n, g] * ( x_i8[m, g] . w_i4[n, g] )

Per K-group: one int8 x int8 -> int32 MXU dot plus an (M, TN) scale-accum
on the VPU — elementwise work collapses from O(N*C) to O(M*N*C/g), and the
int4 unpack is a handful of integer ops per byte. With the model's act_in
configured as int8 per-token (the reference's W4A8 headline config), this
computes the SAME quantized matmul the fake-quant path simulates.

Grid: (M/TM, N/TN, K/TK) with a VMEM f32 accumulator revisited along K —
K-tiling keeps every block sub-MB so Mosaic double-buffers HBM reads even
for the 8192-wide down projection and the 128k-row vocab head (a full-K
resident variant blew VMEM there: int32 unpack intermediates reach 16MB).
Scales are fed pre-transposed as (G, N) strips so the per-group scale is a
static sublane row per unrolled group (no dynamic lane slicing — Mosaic
cannot dynamic-slice the lane dim).

Mosaic note (this libtpu): 8-bit elementwise arithmetic (arith.subi /
shifts on vector<i8>) is unimplemented — the nibble unpack must round-trip
through int32. That costs ~40% over pre-unpacked int8 storage at small M
but reads half the HBM bytes.

Activations are quantized outside the kernel (one XLA absmax pass over the
tiny x) with the reference's restrictive-range semantics (+-127,
round-half-even), so numerics match the simulated path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..qformats.formats import ElemFormat
from ..qformats.qtensor import QTensor


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _w4a8_kernel(x_ref, wp_ref, st_ref, sx_ref, out_ref, acc, *, group: int,
                 tk: int, nk: int, int4: bool):
    """One (TM, TN) output tile, revisited along k.

    x (TM, tk) int8; wp (TN, tk/2) uint8 packed / (TN, tk) int8;
    st (gpk, TN) f32 transposed scale strip for this k block;
    sx (TM, 1) f32 per-token act scale (epilogue); out (TM, TN) bf16;
    acc (TM, TN) f32 scratch.

    The act-scale multiply and bf16 cast run in the epilogue so the (M, N)
    f32 intermediate never round-trips HBM (at decode batch sizes that f32
    traffic was comparable to the packed weight bytes).

    int4 path: per group, unpack the packed bytes into lo/hi int8 planes
    (int32 mask/shift — 8-bit arith is unavailable) and run two K=g/2 int8
    MXU dots; 'group halves' packing makes both planes lane-contiguous.
    """
    k = pl.program_id(2)
    gpk = tk // group
    half = group // 2

    # Per-group contributions accumulate in a LOCAL value (registers/Mosaic
    # temporaries) — `acc[...] +=` per group was a VMEM read-modify-write of
    # the whole (TM, TN) f32 tile x gpk, 8x the tile's own HBM bytes in VMEM
    # traffic (measured: the int8 head ran 3x slower than its DMA floor).
    total = None
    if int4:
        # Whole-tile unpack (two wide VPU passes instead of 2*gpk narrow
        # ones), then ONE K=group MXU dot per group: 'group halves' packing
        # puts group gi's low-nibble elements at byte columns
        # [gi*half, (gi+1)*half) and its high-nibble elements in the same
        # columns' top nibbles, so concat([lo_g, hi_g]) IS the group's
        # elements in natural order and pairs with the full x group slice —
        # halving MXU passes vs two K=group/2 dots.
        wp = wp_ref[...].astype(jnp.int32)
        lo = ((wp & 0xF) - 8).astype(jnp.int8)       # (TN, tk/2)
        hi = ((wp >> 4) - 8).astype(jnp.int8)
        for gi in range(gpk):
            wg = jnp.concatenate(
                [lo[:, gi * half:(gi + 1) * half],
                 hi[:, gi * half:(gi + 1) * half]], axis=1)  # (TN, group)
            part = jax.lax.dot_general(
                x_ref[:, gi * group:(gi + 1) * group], wg,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            c = part.astype(jnp.float32) * st_ref[gi, :][None, :]
            total = c if total is None else total + c
    else:
        for gi in range(gpk):
            xg = x_ref[:, gi * group:(gi + 1) * group]
            wg = wp_ref[:, gi * group:(gi + 1) * group]
            part = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (1,)), ((), ())),
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


@partial(jax.jit, static_argnames=("group", "int4", "tm", "tn", "tk",
                                   "out_dtype"))
def _call(x_i8, wp, scales_t, sx, *, group, int4, tm, tn, tk,
          out_dtype=jnp.bfloat16):
    M, C = x_i8.shape
    N = wp.shape[0]
    nk = C // tk
    gpk = tk // group
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        partial(_w4a8_kernel, group=group, tk=tk, nk=nk, int4=int4),
        grid=(_cdiv(M, tm), _cdiv(N, tn), nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tk // 2 if int4 else tk), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_round_up(M, tm), N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * C,
            bytes_accessed=wp.size + scales_t.size * 4 + M * C + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_i8, wp, scales_t, sx)


def quantize_acts_per_token(x: jnp.ndarray, absmax_axis=None):
    """Per-token symmetric int8 (reference int8-g[-1]-rw semantics).

    ``absmax_axis``: shard_map axis name for a pmax over tensor-parallel
    shards of the row — keeps the scale identical to single-chip execution
    when the contraction dim is sharded."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    if absmax_axis is not None:
        absmax = jax.lax.pmax(absmax, absmax_axis)
    scale = jnp.maximum(absmax / 127.0, 1e-5)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dims(qt: QTensor):
    """(N, C, g) from the *array* shapes — inside a shard_map body the
    leaves are local shards, so static QTensor metadata (global logical
    shape) must not be trusted for kernel dispatch."""
    N, G, last = qt.codes.shape
    g = 2 * last if qt.quantizer.fmt == ElemFormat.int4 else last
    return N, G * g, g


def supported(qt: QTensor) -> bool:
    q = qt.quantizer
    if q.eff_axes != -1 or len(qt.shape) != 2 or qt.codes.ndim != 3 or q.zero_point:
        return False
    if not (q.qtype == "int" and q.fmt in (ElemFormat.int4, ElemFormat.int8)):
        return False
    N, C, g = _dims(qt)
    if qt.shape[-1] % g:  # logical C was padded at pack time -> XLA path
        return False
    return (C % g == 0 and g % 256 in (0, 128) and N % 128 == 0
            and C % 128 == 0 and g >= 128)


def _pick_tk(C: int, g: int) -> int:
    """Largest whole-group K tile <= 2048 dividing C (>=1 group)."""
    ng = C // g
    for m in (16, 8, 4, 2, 1):
        if m * g <= 2048 and ng % m == 0:
            return m * g
    return g


def w4a8_matmul(x: jnp.ndarray, qt: QTensor, bias=None,
                absmax_axis=None) -> jnp.ndarray:
    """y = act_q(x) @ W^T fully integer on the MXU. Callers should have
    act_in == int8 per-token (this kernel IS that quantizer + matmul)."""
    N, C, g = _dims(qt)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, C)
    M = x2.shape[0]

    x_i8, sx = quantize_acts_per_token(x2, absmax_axis)
    scales_t = qt.scales.reshape(N, C // g).T  # (G, N): static sublane rows
    int4 = qt.quantizer.fmt == ElemFormat.int4
    wp = qt.codes.reshape(N, C // 2) if int4 else qt.codes.reshape(N, C)

    tm = min(_round_up(M, 32), 256)  # int8 sublane tile is 32
    # Large TN with a cdiv grid: Mosaic masks the partial boundary block, so
    # odd row counts (e.g. the 128256-row vocab head) don't force tiny tiles
    # (TN=256 there costs 3x, measured).
    tn = 1024 if N >= 1024 else next(t for t in (512, 256, 128) if N % t == 0)
    tk = _pick_tk(C, g)
    if M % tm:
        pad = (-M) % tm
        x_i8 = jnp.pad(x_i8, ((0, pad), (0, 0)))
        sx = jnp.pad(sx, ((0, pad), (0, 0)), constant_values=1.0)
    out = _call(x_i8, wp, scales_t, sx.astype(jnp.float32),
                group=g, int4=int4, tm=tm, tn=tn, tk=tk,
                out_dtype=jnp.dtype(x.dtype))
    out = out[:M, :N]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(*lead, N)
