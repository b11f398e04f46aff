"""Fused W4A8 matmul — int8 activations x int4/int8 weights on the MXU.

The dequantize-to-bf16 kernel (dequant_matmul.py) pays ~8 VPU ops per
weight element, which dominates decode where M is tiny. This kernel keeps
weights integer all the way into the MXU (v5e has native int8 matmul):

    y[m, n] = sx[m] * sum_g  s_w[n, g] * ( x_i8[m, g] . w_i4[n, g] )

Per K-group: one int8 x int8 -> int32 MXU dot plus an (M, TN) scale-accum
on the VPU — elementwise work collapses from O(N*C) to O(M*N*C/g), and the
int4 unpack is two integer ops per element. With the model's act_in
configured as int8 per-token (the reference's W4A8 headline config), this
computes the SAME quantized matmul the fake-quant path simulates.

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


def _w4a8_kernel(x_ref, wp_ref, s_ref, out_ref, acc, *, group: int, n_groups: int,
                 int4: bool):
    """Grid (nm, nn); full K resident. x int8 (TM, C); wp packed (TN, C/2 or C);
    s (TN, n_groups) f32; out (TM, TN) f32 (pre act-scale).

    int4 path: ONE full-width unpack into lo/hi int8 planes (two mask/shift
    passes over C/2 lanes), then per group two K=g/2 int8 MXU dots — measured
    at native-int8 matmul speed on v5e while reading half the bytes."""
    acc[...] = jnp.zeros_like(acc)
    half = group // 2
    if int4:
        wpv = wp_ref[...].astype(jnp.int32)
        lo_all = ((wpv & 0xF) - 8).astype(jnp.int8)   # (TN, C/2)
        hi_all = ((wpv >> 4) - 8).astype(jnp.int8)
        for g in range(n_groups):
            xlo = x_ref[:, g * group : g * group + half]
            xhi = x_ref[:, g * group + half : (g + 1) * group]
            part = jax.lax.dot_general(
                xlo, lo_all[:, g * half : (g + 1) * half],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            part += jax.lax.dot_general(
                xhi, hi_all[:, g * half : (g + 1) * half],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc[...] += part.astype(jnp.float32) * s_ref[:, g][None, :]
    else:
        for g in range(n_groups):
            xg = x_ref[:, g * group : (g + 1) * group]
            wg = wp_ref[:, g * group : (g + 1) * group]
            part = jax.lax.dot_general(
                xg, wg,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc[...] += part.astype(jnp.float32) * s_ref[:, g][None, :]
    out_ref[...] = acc[...]


@partial(jax.jit, static_argnames=("group", "int4", "tm", "tn"))
def _call(x_i8, wp, scales, *, group, int4, tm, tn):
    M, C = x_i8.shape
    N = wp.shape[0]
    n_groups = C // group
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        partial(_w4a8_kernel, group=group, n_groups=n_groups, int4=int4),
        grid=(_cdiv(M, tm), _cdiv(N, tn)),
        in_specs=[
            pl.BlockSpec((tm, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, wp.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, n_groups), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_round_up(M, tm), N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * C,
            bytes_accessed=wp.size + scales.size * 4 + M * C + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_i8, wp, scales)


def quantize_acts_per_token(x: jnp.ndarray):
    """Per-token symmetric int8 (reference int8-g[-1]-rw semantics)."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-5)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def supported(qt: QTensor) -> bool:
    q = qt.quantizer
    if q.eff_axes != -1 or len(qt.shape) != 2 or q.zero_point:
        return False
    if not (q.qtype == "int" and q.fmt in (ElemFormat.int4, ElemFormat.int8)):
        return False
    N, C = qt.shape
    g = qt.blocked_shape[qt.group_axis]
    return (C % g == 0 and g % 256 in (0, 128) and N % 128 == 0
            and C % 128 == 0 and g >= 128)


def w4a8_matmul(x: jnp.ndarray, qt: QTensor, bias=None) -> jnp.ndarray:
    """y = act_q(x) @ W^T fully integer on the MXU. Callers should have
    act_in == int8 per-token (this kernel IS that quantizer + matmul)."""
    N, C = qt.shape
    g = qt.blocked_shape[qt.group_axis]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, C)
    M = x2.shape[0]

    x_i8, sx = quantize_acts_per_token(x2)
    scales = qt.scales.reshape(N, C // g)
    int4 = qt.quantizer.fmt == ElemFormat.int4
    wp = qt.codes.reshape(N, C // 2) if int4 else qt.codes.reshape(N, C)

    tm = min(_round_up(M, 32), 256)  # int8 sublane tile is 32
    # Large TN with a cdiv grid: Mosaic masks the partial boundary block, so
    # odd row counts (e.g. the 128256-row vocab head) don't force tiny tiles
    # (TN=256 there costs 3x, measured).
    tn = 1024 if N >= 1024 else next(t for t in (512, 256, 128) if N % t == 0)
    if M % tm:
        x_i8 = jnp.pad(x_i8, ((0, (-M) % tm), (0, 0)))
    out = _call(x_i8, wp, scales, group=g, int4=int4, tm=tm, tn=tn)
    out = (out[:M, :N] * sx).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(*lead, N)
