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

int4 nibble layout (round 5): codes pack as "pair planes" (see
qformats/qtensor._pack_nibbles_pairs) — byte column j of group pair t
holds elem j of group 2t in its low nibble and elem j of group 2t+1 in
its high nibble, so each per-group K=g dot reads a CONTIGUOUS slice of a
nibble plane and the unpack is three vector<u8> byte-ops (8-bit AND/OR/
XOR lower on this Mosaic; shifts/add/sub do not — the legacy "group
halves" layout forced an int32 unpack round-trip plus one lane
concatenate per group, measured as most of the kernel's gap to its DMA
floor: experiments/exp_plane_probe.py). Legacy tensors (odd group count,
pre-r5 checkpoints) keep the old unpack paths below.

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


# Process-level unpack-strategy A/B knob for LEGACY "group halves" codes
# (pair-planes tensors — the default since round 5 — always use the
# byte-op plane path in _w4a8_total). Read at import: jit caches would
# ignore later changes anyway. Measured at flagship decode shapes
# (M=128, g=128; experiments/exp_unpack_xor.py, same-run pairs, 2026-08-20):
#   i32    — DEFAULT: both planes through an int32 round-trip, one K=group
#            concat dot per group. 218-280 GB/s packed.
#   hybrid — lo plane via ONE vector<u8> op (P & 0x0F; this Mosaic has
#            8-bit AND/OR/XOR but no 8-bit shifts/add/sub —
#            exp_i8_ops_probe.py), bias folded into a narrow f32 epilogue
#            matmul; hi via int32. Measured EQUAL to i32 (220-280 GB/s):
#            the kernel is MXU-pass-bound at decode M, not unpack-bound.
#   xor    — bitwise-ops-only planes (L=lo+8, H=16*hi via the sign-flip
#            two's-complement trick), TWO K=group/2 dots per group.
#            Measured 20-40% SLOWER (156-184 GB/s): the doubled MXU passes
#            cost more than all the saved VPU work.
# The alternates stay numerics-tested (tests/test_w4a8.py::
# test_unpack_modes_agree) because the verdict flips if a future libtpu
# gains 8-bit shifts (hi drops its round-trip too and 'hybrid' should win).
import os as _os

_UNPACK = _os.environ.get("LLMC_INT4_UNPACK", "i32")
# Latched ONCE at import (jit caches key on static args — a mid-process
# env flip is silently ignored by compiled code, ADVICE r4):
_NO_FUSED_MLP = bool(_os.environ.get("LLMC_NO_FUSED_MLP"))


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _w4a8_kernel(x_ref, wp_ref, st_ref, sx_ref, out_ref, acc, *, group: int,
                 tk: int, nk: int, int4: bool, pairs: bool = False):
    """One (TM, TN) output tile, revisited along k.

    x (TM, tk) int8; wp (TN, tk/2) uint8 packed / (TN, tk) int8;
    st (gpk, TN) f32 transposed scale strip for this k block;
    sx (TM, 1) f32 per-token act scale (epilogue); out (TM, TN) bf16;
    acc (TM, TN) f32 scratch.

    The act-scale multiply and bf16 cast run in the epilogue so the (M, N)
    f32 intermediate never round-trips HBM (at decode batch sizes that f32
    traffic was comparable to the packed weight bytes).

    int4 path: pair-planes codes take the byte-op unpack + contiguous
    K=g plane dots (see _w4a8_total); legacy group-halves codes unpack
    via int32 round-trip with one lane concatenate per group.
    """
    k = pl.program_id(2)
    gpk = tk // group
    half = group // 2
    _w4a8_body(x_ref[...], wp_ref, st_ref, sx_ref[...], out_ref, acc,
               k=k, group=group, gpk=gpk, half=half, nk=nk, int4=int4,
               pairs=pairs)


def _w4a8_total(x_i8, wp_ref, st_ref, *, group, gpk, half, int4,
                pairs=False):
    """One k-block's scaled partial sum (TM, TN) f32 for a weight/scale
    block pair — the unpack/dot/scale core shared by every kernel variant.

    Per-group contributions accumulate in a LOCAL value (registers/Mosaic
    temporaries) — `acc[...] +=` per group was a VMEM read-modify-write of
    the whole (TM, TN) f32 tile x gpk, 8x the tile's own HBM bytes in VMEM
    traffic (measured: the int8 head ran 3x slower than its DMA floor)."""
    total = None
    if int4 and pairs:
        # PAIR-PLANES layout (the int4 default since round 5, see
        # qformats/qtensor._pack_nibbles_pairs): byte column j of group
        # pair t holds (elem j of group 2t | elem j of group 2t+1 << 4).
        # Unpack is THREE vector<u8> byte-ops at full int8 lane density
        # (this Mosaic has 8-bit AND/OR/XOR but no 8-bit shifts/add/sub —
        # exp_i8_ops_probe.py) and every per-group dot reads a CONTIGUOUS
        # K=g plane slice — no per-group lane concatenates (the old
        # layout's dominant overhead: exp_plane_probe.py, qkv 15.1 ->
        # 13.2 us/call same-run) and no K=g/2 half-depth dots (the xor-
        # mode loss):
        #   L = bitcast_i8(P & 0x0F)          = lo + 8        (even groups)
        #   H = bitcast_i8((P ^ 0x80) & 0xF0) = 16 * hi       (odd groups)
        # (flipping bit 7 turns the biased high nibble into its 4-bit
        # two's complement, which the int8 byte sign-extends: 16*hi exact.)
        # The 16x folds into the odd groups' scale rows (st * 0.0625 —
        # exact: both are powers-of-two apart); the +8 lo bias is linear in
        # the dot and collapses into ONE narrow f32 epilogue matmul:
        #   sum_even_g (dot(x_g, lo_g + 8) - 8*rowsum(x_g)) * st_g
        #   == [per-group dots] - 8 * (s_e @ st_e),   (TM,gpk/2)@(gpk/2,TN)
        # All intermediates are f32-exact: |dot(x_g, L_g)| <= 127*15*g
        # < 2^24, |16*d_odd| <= 127*8*16*g < 2^24, |s_e| <= 127*g < 2^24.
        P = wp_ref[...]                                     # (TN, tk/2) u8
        L = jax.lax.bitcast_convert_type(P & 0x0F, jnp.int8)
        H = jax.lax.bitcast_convert_type((P ^ 0x80) & 0xF0, jnp.int8)
        hp = gpk // 2
        tk_ = gpk * group
        kidx = jax.lax.broadcasted_iota(jnp.int32, (tk_, hp), 0)
        tsel = jax.lax.broadcasted_iota(jnp.int32, (tk_, hp), 1)
        ind = ((kidx // group) % 2 == 0) & ((kidx // (2 * group)) == tsel)
        e_ind = jnp.where(ind, 1, 0).astype(jnp.int8)       # (tk, hp)
        s_e = jax.lax.dot_general(                          # (TM, hp) i32
            x_i8, e_ind, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        for gi in range(gpk):
            t, odd = divmod(gi, 2)
            plane = H if odd else L
            part = jax.lax.dot_general(
                x_i8[:, gi * group:(gi + 1) * group],
                plane[:, t * group:(t + 1) * group],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            sc = st_ref[gi, :][None, :]
            c = part.astype(jnp.float32) * (sc * 0.0625 if odd else sc)
            total = c if total is None else total + c
        st_e = jnp.stack([st_ref[2 * t, :] for t in range(hp)])
        corr = jax.lax.dot_general(                         # (TM, TN) f32
            s_e.astype(jnp.float32), st_e,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        total = total - 8.0 * corr
    elif int4 and _UNPACK == "hybrid":
        # Hybrid unpack: the lo plane needs NO int32 round-trip — P & 0x0F
        # is a single vector<u8> op (this Mosaic implements 8-bit AND/OR/
        # XOR but not shifts/add/sub — exp_i8_ops_probe.py), giving the
        # BIASED low nibble lo+8 in [0,15]; the -8 bias is linear in the
        # dot, corrected by one narrow MXU dot against a group-half
        # indicator (s_a = per-group sums of the lo-paired x columns).
        # Only the hi plane round-trips through int32 (shift needs it).
        # One K=group concat dot per group, same as i32 mode. The -8 bias
        # is linear, so the WHOLE correction collapses into one narrow f32
        # matmul in the epilogue instead of 16 full-tile vector passes:
        #   sum_g (dot(x_a_g, lo_g + 8) - 8*s_a[g]) * st[g]
        #   == sum_g dot(x_a_g, lo_g) * st[g]
        #   == [per-group dots] - 8 * (s_a_f32 @ st)        (TM,gpk)@(gpk,TN)
        # Exact in f32: s_a <= 127*64 < 2^13 and st is the exact group
        # scale — products/sums stay well within f32's 24-bit mantissa
        # relative to the same values the i32 path feeds through c.
        P = wp_ref[...]                                     # (TN, tk/2) u8
        lo_b = jax.lax.bitcast_convert_type(P & 0x0F, jnp.int8)  # lo + 8
        hi = ((P.astype(jnp.int32) >> 4) - 8).astype(jnp.int8)
        tk_ = gpk * group
        kidx = jax.lax.broadcasted_iota(jnp.int32, (tk_, gpk), 0)
        gsel = jax.lax.broadcasted_iota(jnp.int32, (tk_, gpk), 1)
        ind = ((kidx // group) == gsel) & ((kidx % group) < half)
        a_ind = jnp.where(ind, 1, 0).astype(jnp.int8)       # (tk, gpk)
        s_a = jax.lax.dot_general(                          # (TM, gpk) i32
            x_i8, a_ind, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        for gi in range(gpk):
            wg = jnp.concatenate(
                [lo_b[:, gi * half:(gi + 1) * half],
                 hi[:, gi * half:(gi + 1) * half]], axis=1)  # (TN, group)
            part = jax.lax.dot_general(
                x_i8[:, gi * group:(gi + 1) * group], wg,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            c = part.astype(jnp.float32) * st_ref[gi, :][None, :]
            total = c if total is None else total + c
        corr = jax.lax.dot_general(                         # (TM, TN) f32
            s_a.astype(jnp.float32), st_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        total = total - 8.0 * corr
    elif int4 and _UNPACK == "xor":
        # Bitwise-ops-only unpack: this Mosaic implements AND/OR/XOR on
        # vector<u8|i8> but NOT 8-bit shifts/add/sub (experiments/
        # exp_i8_ops_probe.py), so instead of round-tripping every byte
        # through int32 (the old path — compute-bound at ~208 GB/s packed),
        # build two int8 planes with THREE byte-ops at full i8 lane density:
        #   L = bitcast_i8(P & 0x0F)          = lo + 8      (biased low)
        #   H = bitcast_i8((P ^ 0x80) & 0xF0) = 16 * hi     exactly
        # (flipping bit 7 turns the biased high nibble into its 4-bit
        # two's complement, which the int8 byte value sign-extends: e.g.
        # hi=-3 -> nibble 13 -> byte 0xD0 -> int8 -48 = 16*(-3)).
        # Per group ('group halves' packing: byte column b of the group
        # holds elem b in its low nibble, elem b + group/2 in its high):
        #   dot(x_a, L) + (dot(x_b, H) >> 4) - 8*sum(x_a)
        # == dot(x_a, lo) + dot(x_b, hi) — BITWISE identical int32 to the
        # int32-unpack path (dot(x_b,H) is divisible by 16, so the
        # arithmetic shift is exact). Two K=half dots per group equal one
        # K=group pass in MXU occupancy; the -8 bias correction comes from
        # ONE extra narrow dot against a group-half indicator matrix.
        P = wp_ref[...]                                     # (TN, tk/2) u8
        L = jax.lax.bitcast_convert_type(P & 0x0F, jnp.int8)
        H = jax.lax.bitcast_convert_type((P ^ 0x80) & 0xF0, jnp.int8)
        tk_ = gpk * group
        kidx = jax.lax.broadcasted_iota(jnp.int32, (tk_, gpk), 0)
        gsel = jax.lax.broadcasted_iota(jnp.int32, (tk_, gpk), 1)
        ind = ((kidx // group) == gsel) & ((kidx % group) < half)
        a_ind = jnp.where(ind, 1, 0).astype(jnp.int8)       # (tk, gpk)
        s_a = jax.lax.dot_general(                          # (TM, gpk) i32
            x_i8, a_ind, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        for gi in range(gpk):
            d_lo = jax.lax.dot_general(
                x_i8[:, gi * group: gi * group + half],
                L[:, gi * half:(gi + 1) * half],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            d_hi = jax.lax.dot_general(
                x_i8[:, gi * group + half:(gi + 1) * group],
                H[:, gi * half:(gi + 1) * half],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            part = d_lo + (d_hi >> 4) - 8 * s_a[:, gi:gi + 1]
            c = part.astype(jnp.float32) * st_ref[gi, :][None, :]
            total = c if total is None else total + c
    elif int4:
        # Legacy int32-round-trip unpack (LLMC_INT4_UNPACK=i32): whole-tile
        # lo/hi nibble planes then ONE K=group MXU dot per group on the
        # concatenated [lo_g, hi_g] operand.
        wp = wp_ref[...].astype(jnp.int32)
        lo = ((wp & 0xF) - 8).astype(jnp.int8)       # (TN, tk/2)
        hi = ((wp >> 4) - 8).astype(jnp.int8)
        for gi in range(gpk):
            wg = jnp.concatenate(
                [lo[:, gi * half:(gi + 1) * half],
                 hi[:, gi * half:(gi + 1) * half]], axis=1)  # (TN, group)
            part = jax.lax.dot_general(
                x_i8[:, gi * group:(gi + 1) * group], wg,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            c = part.astype(jnp.float32) * st_ref[gi, :][None, :]
            total = c if total is None else total + c
    else:
        for gi in range(gpk):
            xg = x_i8[:, gi * group:(gi + 1) * group]
            wg = wp_ref[:, gi * group:(gi + 1) * group]
            part = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            c = part.astype(jnp.float32) * st_ref[gi, :][None, :]
            total = c if total is None else total + c

    return total


def _w4a8_body(x_i8, wp_ref, st_ref, sx, out_ref, acc, *, k, group, gpk,
               half, nk, int4, pairs=False):
    """Shared accumulate/epilogue wrapper around :func:`_w4a8_total`:
    ``x_i8`` is the (TM, tk) int8 activation block, ``sx`` the (TM, 1)
    f32 act scale (epilogue)."""
    total = _w4a8_total(x_i8, wp_ref, st_ref, group=group, gpk=gpk,
                        half=half, int4=int4, pairs=pairs)

    @pl.when(k == 0)
    def _():
        acc[...] = total

    @pl.when(k > 0)
    def _():
        acc[...] += total

    @pl.when(k == nk - 1)
    def _():
        out_ref[...] = (acc[...] * sx).astype(out_ref.dtype)


def _w4a8_kernel_actq(x_ref, wp_ref, st_ref, out_ref, acc, xi_s, sx_s, *,
                      group: int, tk: int, nk: int, int4: bool,
                      pairs: bool = False):
    """Variant with the per-token int8 activation quantizer INSIDE the
    kernel: ``x_ref`` is the FULL bf16/f32 activation row block (TM, C),
    quantized once per M-block into VMEM scratch (``xi_s`` (nk, TM, tk)
    int8, ``sx_s`` (TM, 1) f32) at the first (j, k) visit and reused for
    every weight tile.

    Why: the XLA prologue (absmax + divide + round + int8 cast) measured
    15-18us per call at decode M — more than the whole scale machinery of
    the kernel itself (experiments/exp_kernel_dissect2.py: the int8
    kernel dropped 59.7 -> 42.3us once x arrived pre-quantized). The int8
    cast forces an XLA relayout (bf16 (16,128) tiles -> int8 (32,128))
    that cannot fuse with the custom call; doing the quantize in VMEM
    removes the boundary. Grid dim j is 'arbitrary' so the (j==0, k==0)
    quantize-once is well-defined under any core split.

    Numerics identical to :func:`quantize_acts_per_token` (same jnp ops).
    """
    j = pl.program_id(1)
    k = pl.program_id(2)
    gpk = tk // group
    half = group // 2

    @pl.when((j == 0) & (k == 0))
    def _():
        x32 = x_ref[...].astype(jnp.float32)            # (TM, C)
        absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax / 127.0, 1e-5)
        sx_s[...] = scale
        q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
        for kk in range(nk):
            xi_s[kk] = q[:, kk * tk:(kk + 1) * tk]

    _w4a8_body(xi_s[k], wp_ref, st_ref, sx_s[...], out_ref, acc,
               k=k, group=group, gpk=gpk, half=half, nk=nk, int4=int4,
               pairs=pairs)


@partial(jax.jit, static_argnames=("group", "int4", "tm", "tn", "tk",
                                   "out_dtype", "pairs"))
def _call(x_i8, wp, scales_t, sx, *, group, int4, tm, tn, tk,
          out_dtype=jnp.bfloat16, pairs=False):
    M, C = x_i8.shape
    N = wp.shape[0]
    nk = C // tk
    gpk = tk // group
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        partial(_w4a8_kernel, group=group, tk=tk, nk=nk, int4=int4,
                pairs=pairs),
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


def _w4a8_kernel_stacked(li_ref, x_ref, wp_ref, st_ref, sx_ref, out_ref, acc,
                         *, group: int, tk: int, nk: int, int4: bool,
                         pairs: bool = False):
    """Stacked-weight variant: wp/st carry a leading (1,) layer block and
    the layer index arrives as scalar prefetch — the weight DMA reads
    straight out of the full (L, N, K) buffer at the right offset."""
    k = pl.program_id(2)
    gpk = tk // group
    half = group // 2
    _w4a8_body(x_ref[...], wp_ref[0], st_ref[0], sx_ref[...], out_ref,
               acc, k=k, group=group, gpk=gpk, half=half, nk=nk, int4=int4,
               pairs=pairs)


@partial(jax.jit, static_argnames=("group", "int4", "tm", "tn", "tk",
                                   "out_dtype", "pairs"))
def _call_stacked(x_i8, wp, scales_t, sx, layer, *, group, int4, tm, tn, tk,
                  out_dtype=jnp.bfloat16, pairs=False):
    """Layer-indexed matmul over STACKED packed weights (L, N, K[/2]).

    Inside a lax.scan, feeding per-layer weights as scan xs materializes a
    dynamic-slice copy of every layer's codes before the kernel can read
    them (custom-call operands must be dense buffers) — measured
    +0.73 ms/step at the flagship's batch-128 decode shapes
    (experiments/exp_scan_weight_copy.py). Here the full stacked buffer is
    a loop-invariant operand and the LAYER INDEX rides as scalar prefetch
    into the BlockSpec index maps, so each program's weight DMA reads the
    layer's tile directly from HBM. Same math as :func:`_call`."""
    M, C = x_i8.shape
    N = wp.shape[1]
    nk = C // tk
    gpk = tk // group
    interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # layer index
        grid=(_cdiv(M, tm), _cdiv(N, tn), nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k, li: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, tk // 2 if int4 else tk),
                         lambda i, j, k, li: (li[0], j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpk, tn), lambda i, j, k, li: (li[0], k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j, k, li: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k, li: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        partial(_w4a8_kernel_stacked, group=group, tk=tk, nk=nk, int4=int4,
                pairs=pairs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((_round_up(M, tm), N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * C,
            bytes_accessed=wp.size // wp.shape[0] + scales_t.size // wp.shape[0] * 4
            + M * C + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32).ravel(), x_i8, wp, scales_t, sx)


def _w4a8_kernel_gateup_silu(li_ref, x_ref, wg_ref, wu_ref, stg_ref,
                             stu_ref, sx_ref, out_ref, acc_g, acc_u, *,
                             group: int, tk: int, nk: int, int4: bool,
                             act: str, pairs: bool = False):
    """Fused gate|up matmuls + silu(gate)*up epilogue over STACKED packed
    gateup weights (scalar-prefetch layer index).

    The serving MLP previously ran ONE gateup kernel producing the
    (M, 2I) concat, then XLA silu-multiplied the halves and the down
    kernel re-read the (M, I) product — ~8 MB of HBM round-trips per
    layer at the bench shape (y write+read plus h write+read). Here each
    program fetches the PAIRED gate and up weight tiles (two views into
    the same stacked buffer, offset index maps), keeps both accumulators
    in VMEM, and writes only the activated (TM, TN) h tile. Numerics:
    each half is rounded through the out dtype with the act scale exactly
    like the plain kernel, but the activation epilogue runs in f32 with a
    single final round (the split path rounds per HLO op) — equal to the
    split path within a few out-dtype ulps."""
    k = pl.program_id(2)
    gpk = tk // group
    half = group // 2
    tg = _w4a8_total(x_ref[...], wg_ref[0], stg_ref[0], group=group,
                     gpk=gpk, half=half, int4=int4, pairs=pairs)
    tu = _w4a8_total(x_ref[...], wu_ref[0], stu_ref[0], group=group,
                     gpk=gpk, half=half, int4=int4, pairs=pairs)

    @pl.when(k == 0)
    def _():
        acc_g[...] = tg
        acc_u[...] = tu

    @pl.when(k > 0)
    def _():
        acc_g[...] += tg
        acc_u[...] += tu

    @pl.when(k == nk - 1)
    def _():
        sx = sx_ref[...]
        # Epilogue stays in f32: Mosaic cannot lower bf16 transcendentals
        # (silu/gelu on a bf16 vector trips a 'vector.broadcast f32->bf16'
        # verifier error on-chip — BENCH_r04). Each half is rounded through
        # the out dtype first so the activation sees the same quantized
        # values the split path's kernel output carries; the activation
        # itself then runs in f32 with ONE final round at the store
        # (split path: per-HLO bf16 rounds) — within a few out-dtype ulps
        # of the split path, asserted in test_fused_gateup_silu_matches_split.
        g = (acc_g[...] * sx).astype(out_ref.dtype).astype(jnp.float32)
        u = (acc_u[...] * sx).astype(out_ref.dtype).astype(jnp.float32)
        if act in ("silu", "swish"):
            h = jax.nn.silu(g) * u
        elif act in ("gelu", "gelu_python"):
            h = jax.nn.gelu(g, approximate=False) * u
        else:  # gelu_new / gelu_pytorch_tanh / gelu_tanh
            h = jax.nn.gelu(g, approximate=True) * u
        out_ref[...] = h.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("group", "int4", "tm", "tn", "tk",
                                   "act", "out_dtype", "pairs"))
def _call_gateup_silu(x_i8, wp, scales_t, sx, layer, *, group, int4, tm,
                      tn, tk, act, out_dtype=jnp.bfloat16, pairs=False):
    """Stacked fused gateup+activation: wp (L, 2I, K[/2]) in fuse_model's
    [gate | up] row order; returns h (M, I)."""
    M, C = x_i8.shape
    N2 = wp.shape[1]
    I = N2 // 2
    nk = C // tk
    gpk = tk // group
    up_off = I // tn  # up rows start at block offset I/tn (static)
    interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # layer index
        grid=(_cdiv(M, tm), I // tn, nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k, li: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, tk // 2 if int4 else tk),
                         lambda i, j, k, li: (li[0], j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, tk // 2 if int4 else tk),
                         lambda i, j, k, li: (li[0], up_off + j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpk, tn), lambda i, j, k, li: (li[0], k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpk, tn),
                         lambda i, j, k, li: (li[0], k, up_off + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j, k, li: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k, li: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32),
                        pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        partial(_w4a8_kernel_gateup_silu, group=group, tk=tk, nk=nk,
                int4=int4, act=act, pairs=pairs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((_round_up(M, tm), I), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N2 * C,
            bytes_accessed=wp.size // wp.shape[0]
            + scales_t.size // wp.shape[0] * 4 + M * C + M * I * 2,
            transcendentals=M * I,
        ),
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32).ravel(), x_i8, wp, wp,
      scales_t, scales_t, sx)  # gate/up = two offset views of one buffer


_GATED_ACTS = ("silu", "swish", "gelu", "gelu_python", "gelu_new",
               "gelu_pytorch_tanh", "gelu_tanh")


def gateup_silu_matmul(x: jnp.ndarray, qt: QTensor, act: str, layer):
    """h = act(x @ Wg^T) * (x @ Wu^T) fused in one kernel over the
    STACKED serving-fused gateup QTensor (codes (L, 2I, K[/2])) — the
    (M, 2I) concat and the (M, I) product never round-trip HBM. Caller
    guarantees: int8 per-token act config, no bias, act in _GATED_ACTS,
    supported(qt) and tn divides I (see gateup_silu_ok)."""
    N2, C, g = _dims(qt)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, C)
    M = x2.shape[0]
    scales_t = (qt.scales_t if qt.scales_t is not None
                else qt.scales.reshape(N2, C // g).T)
    int4 = qt.quantizer.fmt == ElemFormat.int4
    pairs = bool(qt.pair_planes) and int4
    tm = min(_round_up(M, 32), 256)
    I = N2 // 2
    tn = 1024 if I % 1024 == 0 else next(
        t for t in (512, 256, 128) if I % t == 0)
    tk = _pick_tk(C, g, pairs)
    x_i8, sx = quantize_acts_per_token(x2)
    if M % tm:
        pad = (-M) % tm
        x_i8 = jnp.pad(x_i8, ((0, pad), (0, 0)))
        sx = jnp.pad(sx, ((0, pad), (0, 0)), constant_values=1.0)
    out = _call_gateup_silu(x_i8, qt.codes, scales_t,
                            sx.astype(jnp.float32),
                            jnp.asarray(layer, jnp.int32), group=g,
                            int4=int4, tm=tm, tn=tn, tk=tk, act=act,
                            pairs=pairs, out_dtype=jnp.dtype(x.dtype))
    return out[:M, :I].reshape(*lead, I)


def gateup_silu_ok(qt: QTensor, act: str) -> bool:
    """Static gate for the fused gateup+activation kernel.
    LLMC_NO_FUSED_MLP is latched once at module import."""
    if _NO_FUSED_MLP:
        return False
    if act not in _GATED_ACTS or not supported(qt):
        return False
    N2, C, g = _dims(qt)
    I = N2 // 2
    return N2 % 2 == 0 and any(I % t == 0 for t in (1024, 512, 256, 128))


@partial(jax.jit, static_argnames=("group", "int4", "tm", "tn", "tk",
                                   "out_dtype", "pairs"))
def _call_actq(x2, wp, scales_t, *, group, int4, tm, tn, tk,
               out_dtype=jnp.bfloat16, pairs=False):
    """In-kernel act-quant variant: x2 is the raw (M, C) bf16/f32 block.
    The full activation row rides as ONE block per M-tile (index constant
    over j/k -> a single DMA), quantized into VMEM scratch at the first
    visit. j is 'arbitrary' so the quantize-once at (j==0, k==0) precedes
    every consumer on the same core."""
    M, C = x2.shape
    N = wp.shape[0]
    nk = C // tk
    gpk = tk // group
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        partial(_w4a8_kernel_actq, group=group, tk=tk, nk=nk, int4=int4,
                pairs=pairs),
        grid=(_cdiv(M, tm), _cdiv(N, tn), nk),
        in_specs=[
            pl.BlockSpec((tm, C), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tk // 2 if int4 else tk), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_round_up(M, tm), N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32),
                        pltpu.VMEM((nk, tm, tk), jnp.int8),
                        pltpu.VMEM((tm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * C,
            bytes_accessed=wp.size + scales_t.size * 4 + M * C + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, wp, scales_t)


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
    shape) must not be trusted for kernel dispatch. Storage is flat:
    codes (N, C[/2]) — or ([L,] N, C[/2]) for the stacked serving form —
    scales ([L,] N, G)."""
    N, cp = qt.codes.shape[-2:]
    G = qt.scales.shape[-1]
    gp = cp // G
    g = 2 * gp if qt.quantizer.fmt == ElemFormat.int4 else gp
    return N, G * g, g


def supported(qt: QTensor) -> bool:
    q = qt.quantizer
    if q.eff_axes != -1 or len(qt.shape) != 2 or qt.codes.ndim not in (2, 3) \
            or q.zero_point:
        return False
    if not (q.qtype == "int" and q.fmt in (ElemFormat.int4, ElemFormat.int8)):
        return False
    N, C, g = _dims(qt)
    if qt.shape[-1] % g:  # logical C was padded at pack time -> XLA path
        return False
    return (C % g == 0 and g % 256 in (0, 128) and N % 128 == 0
            and C % 128 == 0 and g >= 128)


def _pick_tk(C: int, g: int, pairs: bool = False) -> int:
    """Largest whole-group K tile <= 2048 dividing C (>=1 group). With
    ``pairs`` (pair-planes packed codes) the tile must hold whole group
    PAIRS — even multiples only (a pair's two groups share byte columns,
    so an odd-group tile would split bytes across k blocks)."""
    ng = C // g
    for m in ((16, 8, 4, 2) if pairs else (16, 8, 4, 2, 1)):
        if m * g <= 2048 and ng % m == 0:
            return m * g
    return 2 * g if pairs else g


def w4a8_matmul(x: jnp.ndarray, qt: QTensor, bias=None,
                absmax_axis=None, act_inside: bool = False,
                layer=None) -> jnp.ndarray:
    """y = act_q(x) @ W^T fully integer on the MXU. Callers should have
    act_in == int8 per-token (this kernel IS that quantizer + matmul).

    ``layer`` (traced int32 scalar) selects one layer of a STACKED QTensor
    (codes (L, N, K[/2]), scales_t (L, G, N) — the lax.scan serving form):
    the kernel DMAs that layer's tiles straight from the stacked buffer,
    avoiding the per-step dynamic-slice copy a scan-xs weight pays."""
    N, C, g = _dims(qt)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, C)
    M = x2.shape[0]

    # (G, N) strip: static sublane row per group. Use the pre-materialized
    # pytree leaf — transposing here (inside a decode scan) is not hoisted
    # by XLA and measured 7-16us per call (exp_kernel_dissect3.py).
    scales_t = (qt.scales_t if qt.scales_t is not None
                else qt.scales.reshape(N, C // g).T)
    int4 = qt.quantizer.fmt == ElemFormat.int4
    pairs = bool(qt.pair_planes) and int4
    wp = qt.codes  # flat (N, C/2) / (N, C) — no per-call relayout

    tm = min(_round_up(M, 32), 256)  # int8 sublane tile is 32
    # Large TN with a cdiv grid: Mosaic masks the partial boundary block, so
    # odd row counts (e.g. the 128256-row vocab head) don't force tiny tiles
    # (TN=256 there costs 3x, measured).
    tn = 1024 if N >= 1024 else next(t for t in (512, 256, 128) if N % t == 0)
    tk = _pick_tk(C, g, pairs)
    if layer is not None:
        x_i8, sx = quantize_acts_per_token(x2, absmax_axis)
        if M % tm:
            pad = (-M) % tm
            x_i8 = jnp.pad(x_i8, ((0, pad), (0, 0)))
            sx = jnp.pad(sx, ((0, pad), (0, 0)), constant_values=1.0)
        out = _call_stacked(x_i8, wp, scales_t, sx.astype(jnp.float32),
                            jnp.asarray(layer, jnp.int32), group=g,
                            int4=int4, tm=tm, tn=tn, tk=tk, pairs=pairs,
                            out_dtype=jnp.dtype(x.dtype))
    elif absmax_axis is None and act_inside:
        # act quant INSIDE the kernel (A/B experiment path; measured ~equal
        # to the XLA prologue once the scale transpose moved out of the
        # per-call graph — exp_kernel_dissect3.py showed the XLA act quant
        # itself costs ~1us, the old 7-16us gap was the (N,G)->(G,N)
        # transpose XLA would not hoist out of the decode scan)
        if M % tm:
            x2 = jnp.pad(x2, ((0, (-M) % tm), (0, 0)))
        out = _call_actq(x2, wp, scales_t, group=g, int4=int4,
                         tm=tm, tn=tn, tk=tk, pairs=pairs,
                         out_dtype=jnp.dtype(x.dtype))
    else:
        x_i8, sx = quantize_acts_per_token(x2, absmax_axis)
        if M % tm:
            pad = (-M) % tm
            x_i8 = jnp.pad(x_i8, ((0, pad), (0, 0)))
            sx = jnp.pad(sx, ((0, pad), (0, 0)), constant_values=1.0)
        out = _call(x_i8, wp, scales_t, sx.astype(jnp.float32),
                    group=g, int4=int4, tm=tm, tn=tn, tk=tk, pairs=pairs,
                    out_dtype=jnp.dtype(x.dtype))
    out = out[:M, :N]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(*lead, N)
