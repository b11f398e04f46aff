"""Fused dequantize(int4/int8/fp8) x bf16 matmul — Pallas TPU kernel.

The quantized-inference hot path: y = x @ W^T with W stored packed
(QTensor) and dequantized *inside* the kernel, so HBM traffic is the packed
bytes + group scales instead of bf16 weights. Decode is HBM-bandwidth
bound, so int4 weights give up to ~3.5x decode speedup over bf16 — this
kernel is the TPU counterpart of the reference's motivation for real packed
execution (the reference only simulates quantization; north star demands
real packed weights, BASELINE.json).

Layout contract (see qformats/qtensor.py):
* int4 codes pack as "pair planes" by default (byte j of group pair t =
  elems (2t*g + j, (2t+1)*g + j); the W4A8 kernel's contiguous-dot layout,
  round 5) or legacy "group halves" (byte i of a group = elems
  (i, i + g/2)) — qt.pair_planes selects the in-kernel unpack.
* scales (and optional zero-points) are one f32 per (row, group).

Grid: (M/TM, N/TN, K/TK) with a VMEM f32 accumulator revisited along K;
K blocks cover whole groups (TK is a multiple of the group size), so each
block's scale slice is a (TN, TK/g) strip.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..qformats.formats import ElemFormat
from ..qformats.qtensor import QTensor, dequantize


def _cdiv(a, b):
    return -(-a // b)


def _select_col(ref, col):
    """Select one column of a small (TN, G) VMEM strip by mask+reduce —
    Mosaic cannot prove alignment for dynamic lane slices, but a masked
    reduction over <=64 lanes is VPU-trivial."""
    v = ref[...]
    ids = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=1)
    return jnp.sum(jnp.where(ids == col, v, 0.0), axis=1, keepdims=True)


def _round_up(x, m):
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _int4_kernel(x_ref, wp_ref, s_ref, z_ref, out_ref, acc,
                 *, group: int, tk: int, nk: int, has_zeros: bool,
                 pairs: bool = False):
    k = pl.program_id(2)
    gpk = tk // group  # groups per k-block

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    wp = wp_ref[...].astype(jnp.int32)
    half = group // 2
    pieces = []
    if pairs:
        # pair-planes layout (qformats/qtensor._pack_nibbles_pairs): byte
        # column j of pair t = (elem j of group 2t | elem j of group
        # 2t+1 << 4) — each nibble plane of a pair's g byte columns IS one
        # whole group, in x-column order [group 2t, group 2t+1].
        for t in range(gpk // 2):
            b = wp[:, t * group:(t + 1) * group]
            for gi, vals in ((2 * t, (b & 0xF) - 8), (2 * t + 1, (b >> 4) - 8)):
                s = _select_col(s_ref, k * gpk + gi)
                if has_zeros:
                    z = _select_col(z_ref, k * gpk + gi)
                    pieces.append(((vals.astype(jnp.float32) - z) * s)
                                  .astype(jnp.bfloat16))
                else:
                    pieces.append(vals.astype(jnp.bfloat16)
                                  * s.astype(jnp.bfloat16))
    else:
        for gi in range(gpk):
            b = wp[:, gi * half : (gi + 1) * half]
            lo = (b & 0xF) - 8
            hi = (b >> 4) - 8
            s = _select_col(s_ref, k * gpk + gi)
            if has_zeros:
                z = _select_col(z_ref, k * gpk + gi)
                pieces.append(((lo.astype(jnp.float32) - z) * s).astype(jnp.bfloat16))
                pieces.append(((hi.astype(jnp.float32) - z) * s).astype(jnp.bfloat16))
            else:
                sb = s.astype(jnp.bfloat16)
                pieces.append(lo.astype(jnp.bfloat16) * sb)
                pieces.append(hi.astype(jnp.bfloat16) * sb)
    w = jnp.concatenate(pieces, axis=-1)  # (TN, TK) bf16

    acc[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        out_ref[...] = acc[...].astype(out_ref.dtype)


def _int8_kernel(x_ref, w_ref, s_ref, z_ref, out_ref, acc,
                 *, group: int, tk: int, nk: int, has_zeros: bool):
    k = pl.program_id(2)
    gpk = tk // group

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    wq = w_ref[...].astype(jnp.float32)
    pieces = []
    for gi in range(gpk):
        b = wq[:, gi * group : (gi + 1) * group]
        s = _select_col(s_ref, k * gpk + gi)
        if has_zeros:
            b = b - _select_col(z_ref, k * gpk + gi)
        pieces.append(b * s)
    w = jnp.concatenate(pieces, axis=-1).astype(jnp.bfloat16) if len(pieces) > 1 else pieces[0].astype(jnp.bfloat16)

    acc[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        out_ref[...] = acc[...].astype(out_ref.dtype)


def _fp8_kernel(x_ref, w_ref, s_ref, z_ref, out_ref, acc,
                *, group: int, tk: int, nk: int, has_zeros: bool):
    k = pl.program_id(2)
    gpk = tk // group

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    wq = w_ref[...].astype(jnp.float32)
    pieces = []
    for gi in range(gpk):
        b = wq[:, gi * group : (gi + 1) * group]
        s = _select_col(s_ref, k * gpk + gi)
        p = b * s
        if has_zeros:
            p = p + _select_col(z_ref, k * gpk + gi)
        pieces.append(p)
    w = jnp.concatenate(pieces, axis=-1).astype(jnp.bfloat16) if len(pieces) > 1 else pieces[0].astype(jnp.bfloat16)

    acc[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        out_ref[...] = acc[...].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side dispatch
# ---------------------------------------------------------------------------


def _dims(qt: QTensor):
    """(N, C, g) from the *array* shapes — inside a shard_map body the
    leaves are local shards, so static QTensor metadata (global logical
    shape) must not be trusted for kernel dispatch. Storage is flat:
    codes (N, C[/2]), scales (N, G)."""
    N, cp = qt.codes.shape
    G = qt.scales.shape[-1]
    gp = cp // G
    packed4 = (qt.quantizer.fmt == ElemFormat.int4
               or qt.quantizer.fmt == ElemFormat.fp4_e2m1)
    g = 2 * gp if packed4 else gp
    return N, G * g, g


def _supported(qt: QTensor) -> bool:
    q = qt.quantizer
    if q.eff_axes != -1 or len(qt.shape) != 2 or qt.codes.ndim != 2:
        return False
    if q.qtype == "int" and q.fmt in (ElemFormat.int4, ElemFormat.int8):
        pass
    elif q.qtype in ("fp", "mx") and q.fmt in (ElemFormat.fp8_e4m3, ElemFormat.fp8_e5m2):
        pass
    else:
        return False
    N, C, g = _dims(qt)
    if qt.shape[-1] % g:  # logical C was padded at pack time -> XLA path
        return False
    if not (C % g == 0 and g % 2 == 0 and N % 128 == 0 and C % 128 == 0 and g >= 128):
        return False
    # int4 K-blocks must yield a packed lane dim that tiles (>=128 bytes)
    if q.fmt == ElemFormat.int4 and (C // g) % 2 and g // 2 < 128:
        return False
    return True


@partial(jax.jit, static_argnames=("kernel", "group", "tk", "has_zeros",
                                   "out_dtype", "pairs"))
def _call(kernel, x2, codes, scales, zeros, *, group, tk, has_zeros,
          out_dtype, pairs=False):
    M, K = x2.shape
    N = codes.shape[0]
    TM = min(_round_up(M, 16), 256)
    TN = 512 if N % 512 == 0 else (256 if N % 256 == 0 else 128)
    nk = K // tk

    pack_div = K // codes.shape[1]  # 2 for int4, 1 otherwise
    grid = (_cdiv(M, TM), N // TN, nk)
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted

    return pl.pallas_call(
        partial(kernel, group=group, tk=tk, nk=nk, has_zeros=has_zeros,
                **({"pairs": pairs} if kernel is _int4_kernel else {})),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, tk // pack_div), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            # scales/zeros: full group axis per N-tile — tiny strips whose
            # lane dim wouldn't tile; the kernel slices by program_id(2)
            pl.BlockSpec((TN, scales.shape[1]), lambda i, j, k: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, scales.shape[1]), lambda i, j, k: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_round_up(M, TM), N), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + N * codes.shape[1] + N * scales.size // N * 4 + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, codes, scales, zeros)


def dequant_matmul(x: jnp.ndarray, qt: QTensor, bias=None) -> jnp.ndarray:
    """y = x @ W^T with in-kernel dequantization.

    x: (..., C) bf16/f32; qt: packed weight, logical shape (N, C), row-wise
    groups. Falls back to the XLA path for unsupported formats/shapes.
    """
    if not _supported(qt):
        return dequant_matmul_xla(x, qt, bias)

    q = qt.quantizer
    N, C, g = _dims(qt)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, C)
    M = x2.shape[0]

    # K blocks must cover whole groups; up to four groups per block
    ng = C // g
    if ng % 4 == 0:
        tk = 4 * g
    elif ng % 2 == 0:
        tk = 2 * g
    else:
        tk = g
    scales = qt.scales  # flat (N, G) — no per-call relayout
    has_zeros = qt.zeros is not None
    zeros = qt.zeros if has_zeros else jnp.zeros_like(scales)
    codes = qt.codes   # flat (N, C/2) / (N, C)

    if q.fmt == ElemFormat.int4 and q.qtype == "int":
        kernel = _int4_kernel
    elif q.fmt == ElemFormat.int8 and q.qtype == "int":
        kernel = _int8_kernel
    else:  # fp8 variants (fp/mx)
        kernel = _fp8_kernel

    x2p = x2 if M % 16 == 0 else jnp.pad(x2, ((0, (-M) % 16), (0, 0)))
    out = _call(kernel, x2p.astype(jnp.bfloat16), codes, scales, zeros,
                group=g, tk=tk, has_zeros=has_zeros, out_dtype=x.dtype,
                pairs=bool(qt.pair_planes))
    out = out[:M]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(*lead, N)


def dequant_matmul_xla(x: jnp.ndarray, qt: QTensor, bias=None) -> jnp.ndarray:
    """XLA reference path: materialize dequantized W, then matmul."""
    w = dequantize(qt)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
