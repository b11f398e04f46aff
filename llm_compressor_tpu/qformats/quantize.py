"""Quantizer specs and pure quantize/dequantize transforms.

This is the TPU-native re-design of the reference's quantizer class hierarchy
(reference: llm_compressor/quantization/quantizers/{int_quant,fp_quant,
mx_quant,nvfp_quant,dummy}.py). Instead of stateful nn.Modules with hooks, a
quantizer here is a frozen, hashable :class:`Quantizer` spec — a pytree-free
static argument — plus pure functions over arrays:

    find_params(q, x)          -> (scales, zeros)  per-group statistics
    fake_quantize(q, x, s, z)  -> x_dq             quantize-dequantize
    quantize_dequant(q, x)     -> x_dq             block + solve + qdq + unblock

All functions are jit-compatible (static shapes, `lax.fori_loop` for the MSE
clip grid search) and run their math in f32 on the VPU.

Numerics parity notes (bit-matching the reference):
* INT uses the restrictive range +-(max_norm * 2**(mbits-2)) = +-7 / +-127
  (int_quant.py:55-59) with torch-style banker's rounding for the value
  round (jnp.round == round-half-even == torch.round).
* INT asymmetric zero-points live in the quantized domain; FP/MX/NVFP
  zero-points are float midpoints in the real domain.
* MX scales are pure powers of two: ``2**(floor(log2(absmax)) - emax)``
  clipped to the 8-bit scale-exponent range (mx_quant.py:88-101).
* NVFP4 uses a global f32 scale ``absmax/(448*6)`` and per-group FP8-E4M3
  quantized scales (nvfp_quant.py:86-100).
* The MSE clip search sweeps p = 1 - i/100 for i in [0, 80) and scores
  sum(|qdq(x)-x|^2.4) per group (int_quant.py:115-162).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .blocking import BlockMeta, block, resolve_group, unblock
from .formats import ElemFormat, FormatParams, format_params
from .numerics import quantize_elemwise

SCALE_EPS = 1e-5


@dataclass(frozen=True)
class Quantizer:
    """Static description of a quantization scheme.

    qtype: "dummy" | "int" | "fp" | "mx" | "nvfp"
    group_size: 0 per-tensor, -1 per-token, -2 per-channel, >0 per-group
    axes: -1 row-wise, -2 column-wise (which axis groups run along)
    """

    qtype: str = "dummy"
    fmt: Optional[ElemFormat] = None
    group_size: int = -1
    axes: int = -1
    zero_point: bool = False
    mse: bool = False
    scale_ebits: int = 8  # MX shared-scale exponent bits

    def __post_init__(self):
        if self.qtype not in ("dummy", "int", "fp", "mx", "nvfp"):
            raise ValueError(f"Unknown qtype {self.qtype!r}")
        if self.qtype == "int" and self.fmt not in (ElemFormat.int4, ElemFormat.int8):
            raise ValueError(f"INT quantizer requires int4/int8, got {self.fmt}")
        if self.qtype == "fp" and self.fmt not in (
            ElemFormat.fp4_e2m1,
            ElemFormat.fp8_e4m3,
            ElemFormat.fp8_e5m2,
        ):
            raise ValueError(f"FP quantizer requires an fp format, got {self.fmt}")
        if self.qtype == "nvfp" and self.fmt != ElemFormat.fp4_e2m1:
            raise ValueError("NVFP quantizer supports fp4_e2m1 only")

    # Normalized axes following the reference convention: per-token forces
    # row-wise, per-channel forces column-wise (int_quant.py:71-78).
    @property
    def eff_axes(self) -> int:
        if self.group_size == -1:
            return -1
        if self.group_size == -2:
            return -2
        return self.axes

    @property
    def params(self) -> FormatParams:
        return format_params(self.fmt)

    @property
    def bits(self) -> int:
        return 16 if self.qtype == "dummy" else self.fmt.bits

    def with_axes_flipped(self) -> "Quantizer":
        """Flip row/column orientation (used for the second matmul operand,
        reference qmatmul.py:33-51)."""
        gs = self.group_size
        if gs == -1:
            gs = -2
        elif gs == -2:
            gs = -1
        return replace(self, group_size=gs, axes=-1 if self.eff_axes == -2 else -2)


# ---------------------------------------------------------------------------
# Scale solvers
# ---------------------------------------------------------------------------


def _minmax(q: Quantizer, xb: jnp.ndarray, axes, keepdims=True):
    if q.zero_point:
        max_val = jnp.max(xb, axis=axes, keepdims=keepdims)
        min_val = jnp.min(xb, axis=axes, keepdims=keepdims)
    else:
        max_val = jnp.max(jnp.abs(xb), axis=axes, keepdims=keepdims)
        min_val = -max_val
    return max_val.astype(jnp.float32), min_val.astype(jnp.float32)


def _solve_int(q: Quantizer, max_val, min_val):
    p = q.params
    q_max = float(p.int_max)
    if q.zero_point:
        scales = (max_val - min_val) / (2.0 * q_max)
        scales = jnp.maximum(scales, SCALE_EPS)
        zeros = jnp.round(-q_max - min_val / scales)
    else:
        scales = max_val / q_max
        zeros = jnp.zeros_like(scales)
    return scales, zeros


def _solve_fp(q: Quantizer, max_val, min_val):
    p = q.params
    if q.zero_point:
        scales = (max_val - min_val) / (2.0 * p.max_norm)
        zeros = (max_val + min_val) / 2.0
    else:
        scales = max_val / p.max_norm
        zeros = jnp.zeros_like(scales)
    return scales, zeros


def _solve_mx(q: Quantizer, max_val, min_val):
    from .formats import FP32_MIN_NORMAL

    p = q.params
    scale_emax = 2 ** (q.scale_ebits - 1) - 1
    if q.zero_point:
        zeros = (max_val + min_val) / 2.0
        absmax = max_val - zeros
    else:
        zeros = jnp.zeros_like(max_val)
        absmax = max_val
    safe = absmax + FP32_MIN_NORMAL * (absmax == 0).astype(jnp.float32)
    shared_exp = jnp.floor(jnp.log2(safe)) - p.emax
    shared_exp = jnp.where(shared_exp > scale_emax, scale_emax + 1, shared_exp)
    shared_exp = jnp.maximum(shared_exp, -scale_emax)
    return jnp.exp2(shared_exp), zeros


def _solve_nvfp(q: Quantizer, max_val, min_val):
    p = q.params
    sp = format_params(ElemFormat.fp8_e4m3)
    if q.zero_point:
        zeros = (max_val + min_val) / 2.0
        absmax = max_val - zeros
    else:
        zeros = jnp.zeros_like(max_val)
        absmax = max_val
    global_absmax = jnp.max(jnp.abs(absmax))
    fp32_scale = global_absmax / (sp.max_norm * p.max_norm)
    fp32_scale = jnp.maximum(fp32_scale, jnp.float32(1e-12))
    group_scaled = absmax / (fp32_scale * p.max_norm)
    fp8_scales = quantize_elemwise(group_scaled, sp, round="nearest")
    return fp8_scales * fp32_scale, zeros


_SOLVERS = {"int": _solve_int, "fp": _solve_fp, "mx": _solve_mx, "nvfp": _solve_nvfp}


# ---------------------------------------------------------------------------
# Fake quantize (on blocked arrays)
# ---------------------------------------------------------------------------


def _fq_int(q: Quantizer, xb, scales, zeros):
    p = q.params
    q_max = float(p.int_max)
    x32 = xb.astype(jnp.float32)
    qv = jnp.clip(jnp.round(x32 / scales + zeros), -q_max, q_max)
    return ((qv - zeros) * scales).astype(xb.dtype)


def _fq_float(q: Quantizer, xb, scales, zeros):
    p = q.params
    x32 = (xb.astype(jnp.float32) - zeros) / scales
    qv = quantize_elemwise(x32, p, round="nearest", saturate_normals=True)
    return (qv * scales + zeros).astype(xb.dtype)


def fake_quantize_blocked(q: Quantizer, xb, scales, zeros):
    """Quantize-dequantize a blocked array with given group params."""
    if q.qtype == "dummy":
        return xb
    if q.qtype == "int":
        return _fq_int(q, xb, scales, zeros)
    return _fq_float(q, xb, scales, zeros)


# ---------------------------------------------------------------------------
# MSE clip-range refinement (grid search, lax.fori_loop)
# ---------------------------------------------------------------------------


def _mse_clip(q: Quantizer, xb, max_val, min_val, scales, zeros, axes,
              norm: float = 2.4, grid: int = 100, maxshrink: float = 0.8):
    solver = _SOLVERS[q.qtype]
    x32 = xb.astype(jnp.float32)

    def err_of(s, z):
        dq = fake_quantize_blocked(q, x32, s, z)
        return jnp.sum(jnp.abs(dq - x32) ** norm, axis=axes, keepdims=axes is not None)

    init_best = jnp.full_like(scales, jnp.inf)

    def body(i, carry):
        best, s, z = carry
        p = 1.0 - i.astype(jnp.float32) / grid
        s1, z1 = solver(q, p * max_val, p * min_val)
        e = err_of(s1, z1)
        take = e < best
        return (
            jnp.where(take, e, best),
            jnp.where(take, s1, s),
            jnp.where(take, z1, z),
        )

    _, scales, zeros = jax.lax.fori_loop(
        0, int(maxshrink * grid), body, (init_best, scales, zeros)
    )
    return scales, zeros


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def find_params_blocked(q: Quantizer, xb, axes):
    """Solve (scales, zeros) for an already-blocked array; reduce over ``axes``."""
    max_val, min_val = _minmax(q, xb, axes)
    scales, zeros = _SOLVERS[q.qtype](q, max_val, min_val)
    if q.mse:
        scales, zeros = _mse_clip(q, xb, max_val, min_val, scales, zeros, axes)
    scales = jnp.maximum(scales, SCALE_EPS)
    return scales, zeros


def block_for(q: Quantizer, x) -> tuple[jnp.ndarray, Optional[BlockMeta], int]:
    """Block ``x`` per the quantizer's group config.

    Returns (blocked, meta, reduce_axes). Per-tensor returns (x, None, None).
    """
    group, axes = resolve_group(q.group_size, q.eff_axes, x.shape)
    if group == 0:
        return x, None, None
    xb, meta = block(x, group, axes)
    return xb, meta, axes


def find_params(q: Quantizer, x):
    """Per-group (scales, zeros) for raw ``x`` (blocks internally)."""
    if q.qtype == "dummy":
        return None, None
    xb, meta, axes = block_for(q, x)
    if meta is None:
        max_val, min_val = _minmax(q, xb, axes=None, keepdims=False)
        scales, zeros = _SOLVERS[q.qtype](q, max_val, min_val)
        if q.mse:
            scales, zeros = _mse_clip(q, xb, max_val, min_val, scales, zeros, axes=None)
        return jnp.maximum(scales, SCALE_EPS), zeros
    return find_params_blocked(q, xb, axes)


@partial(jax.jit, static_argnums=0)
def quantize_dequant(q: Quantizer, x, scales=None, zeros=None):
    """Full fake-quantization: block -> (solve params) -> qdq -> unblock.

    This is the activation-quantization hot path: when ``scales`` is None the
    group statistics are computed in-graph per call (dynamic activation
    quantization, no recompilation across batches).
    """
    if q.qtype == "dummy":
        return x
    xb, meta, axes = block_for(q, x)
    if scales is None:
        if meta is None:
            scales, zeros = find_params(q, x)
        else:
            scales, zeros = find_params_blocked(q, xb, axes)
    x_dq = fake_quantize_blocked(q, xb, scales, zeros)
    if meta is not None:
        x_dq = unblock(x_dq, meta)
    return x_dq


def quantize_dequant_with_params(q: Quantizer, x):
    """Like :func:`quantize_dequant` but also returns the solved params."""
    if q.qtype == "dummy":
        return x, (None, None)
    xb, meta, axes = block_for(q, x)
    if meta is None:
        scales, zeros = find_params(q, x)
    else:
        scales, zeros = find_params_blocked(q, xb, axes)
    x_dq = fake_quantize_blocked(q, xb, scales, zeros)
    if meta is not None:
        x_dq = unblock(x_dq, meta)
    return x_dq, (scales, zeros)
