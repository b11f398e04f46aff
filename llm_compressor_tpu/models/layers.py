"""Primitive layer ops for the shared transformer core (pure jnp).

Norms, activations, rotary embeddings (default / llama3 / linear scaling),
ALiBi slopes, and the quantization-aware linear / matmul ops that replace
the reference's QLinear / QMatmul modules (reference: llm_compressor/
modules/qlinear.py:86-88, qmatmul.py:33-65) with pure functions: activation
quantizers execute in-graph at every forward; weights arrive either as plain
arrays (bf16 or already fake-quantized by calibration) or as packed
:class:`~llm_compressor_tpu.qformats.QTensor` (real quantized execution via
the kernels).

All weights use the reference/HF orientation ``(out_features, in_features)``
so calibration math (Hessians over input channels, per-group scales along
the contraction dim) maps 1:1.
"""

from __future__ import annotations

import math
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp

from ..qformats import ElemFormat, QTensor, Quantizer, dequantize, quantize_dequant
from ..qformats.config import OpQuantConfig
from .config import ModelConfig, RopeScaling

# ---------------------------------------------------------------------------
# Norms and activations
# ---------------------------------------------------------------------------


def rms_norm(x, weight, eps: float, plus_one: bool = False):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if plus_one:
        w = 1.0 + w
    return (x32 * w).astype(dt)


def layer_norm(x, weight, bias, eps: float):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dt)


def apply_norm(cfg: ModelConfig, x, p):
    """Apply the model's norm given a param dict {'weight': w[, 'bias': b]}."""
    if cfg.norm_type == "rmsnorm":
        return rms_norm(x, p["weight"], cfg.rms_norm_eps, cfg.norm_weight_plus_one)
    return layer_norm(x, p["weight"], p.get("bias"), cfg.rms_norm_eps)


def activation(name: str, x):
    if name in ("silu", "swish"):
        return jax.nn.silu(x)
    if name in ("gelu", "gelu_python"):
        return jax.nn.gelu(x, approximate=False)
    if name in ("gelu_new", "gelu_pytorch_tanh", "gelu_tanh"):
        return jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"Unknown activation {name}")


def softcap(x, cap: Optional[float]):
    if cap is None:
        return x
    return jnp.tanh(x / cap) * cap


# ---------------------------------------------------------------------------
# Rotary embeddings
# ---------------------------------------------------------------------------


def rope_inv_freq(dim: int, theta: float, scaling: Optional[RopeScaling]) -> jnp.ndarray:
    """Inverse frequencies, with llama3-style frequency rescaling applied
    statically (matches HF ROPE_INIT_FUNCTIONS['llama3'])."""
    inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    if scaling is None or scaling.kind == "default":
        return inv
    if scaling.kind == "linear":
        return inv / scaling.factor
    if scaling.kind == "llama3":
        low = scaling.original_max_position / scaling.low_freq_factor
        high = scaling.original_max_position / scaling.high_freq_factor
        wavelen = 2.0 * math.pi / inv
        smooth = (scaling.original_max_position / wavelen - scaling.low_freq_factor) / (
            scaling.high_freq_factor - scaling.low_freq_factor
        )
        scaled = jnp.where(
            wavelen > low,
            inv / scaling.factor,
            jnp.where(wavelen < high, inv, (1 - smooth) * inv / scaling.factor + smooth * inv),
        )
        return scaled
    raise ValueError(f"Unsupported rope scaling {scaling.kind}")


def rope_cos_sin(positions, inv_freq):
    """positions (B, T) int32 -> cos/sin (B, T, rot_dim) f32."""
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (B, T, rot/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x, cos, sin):
    """HF rotate-half convention. x: (B, T, H, D_rot); cos/sin: (B, T, D_rot)."""
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * c + rotated * s


# ---------------------------------------------------------------------------
# ALiBi (BLOOM)
# ---------------------------------------------------------------------------


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """HF BLOOM slope construction (powers of 2^(-8/n), with the odd-head
    interleave for non-power-of-two head counts)."""
    closest = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    powers = [base ** (i + 1) for i in range(closest)]
    if closest != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        n_rem = min(closest, n_heads - closest)
        powers += [extra_base ** (2 * i + 1) for i in range(n_rem)]
    return jnp.asarray(powers, dtype=jnp.float32)


def alibi_bias(n_heads: int, kv_positions: jnp.ndarray) -> jnp.ndarray:
    """(H, 1, S) additive bias: slope_h * kv_position.

    Inside a tensor-parallel shard_map trace (tp_trace), ``n_heads`` is the
    LOCAL head count but the slopes are a function of the GLOBAL head index
    (reference HF BLOOM build_alibi_tensor semantics): build the full slope
    table for ``n_heads * n_shards`` heads and slice this shard's block at
    axis_index * n_heads — numerics identical to single-chip."""
    if _TP["axis"] is not None and _TP["size"] > 1:
        all_slopes = alibi_slopes(n_heads * _TP["size"])
        off = jax.lax.axis_index(_TP["axis"]) * n_heads
        slopes = jax.lax.dynamic_slice_in_dim(all_slopes, off, n_heads)
    else:
        slopes = alibi_slopes(n_heads)  # (H,)
    return slopes[:, None, None] * kv_positions[None, None, :].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Quantization-aware linear / matmul
# ---------------------------------------------------------------------------

# Tensor-parallel trace context (set by parallel.tp while tracing a
# shard_map body). Row-parallel slots have their contraction dim sharded:
# the local matmul yields a partial sum that must be psum'ed over the model
# axis BEFORE bias / output quantization; their per-token activation scales
# need a global (pmax) absmax so numerics match single-chip execution.
_TP = {"axis": None, "size": 1}
_TP_ROW_SLOTS = frozenset(("o", "down", "fc2"))


@contextmanager
def tp_trace(axis: str, size: int = 1):
    """Enable TP-aware qlinear behavior while tracing a shard_map body.
    ``size`` is the model-axis extent (needed by ALiBi, whose slopes are a
    function of the global head index)."""
    prev = (_TP["axis"], _TP["size"])
    _TP["axis"], _TP["size"] = axis, size
    try:
        yield
    finally:
        _TP["axis"], _TP["size"] = prev


def _w4a8_kgroups(qt: QTensor) -> int:
    """Number of K-groups (C/g) of a packed QTensor — the integer
    kernel's per-group VPU scale-accum scales with it (prefill routing)."""
    from ..kernels.w4a8_matmul import _dims

    _, C, g = _dims(qt)
    return C // g


def maybe_quant(q: Optional[Quantizer], x):
    if q is None or q.qtype == "dummy":
        return x
    return quantize_dequant(q, x)


def _quant_global_per_token(q: Quantizer, x, axis_name: str):
    """Per-token fake quant with the absmax taken over the full (sharded)
    row via pmax — exact single-chip semantics under tensor parallelism.
    Only int per-token symmetric is supported (the serving act config);
    other quantizers fall back to local stats."""
    if not (q.qtype == "int" and q.group_size == -1 and not q.zero_point):
        return quantize_dequant(q, x)
    qmax = float(q.params.int_max)
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    absmax = jax.lax.pmax(absmax, axis_name)
    scale = jnp.maximum(absmax / qmax, 1e-9)
    return (jnp.clip(jnp.round(x32 / scale), -qmax, qmax) * scale).astype(x.dtype)


class LayerSlice:
    """One layer's view into a STACKED packed weight (the lax.scan serving
    form): ``qt`` holds stacked leaves (codes (L, N, K[/2]), scales_t
    (L, G, N)) and ``layer`` is the traced scan index. qlinear passes both
    straight to the fused kernel, whose scalar-prefetch index maps DMA the
    layer's tiles directly out of the stacked HBM buffer — feeding sliced
    weights through scan xs instead materializes a dynamic-slice copy of
    ~all packed bytes every decode step (+0.73 ms/step at flagship batch
    128, experiments/exp_scan_weight_copy.py)."""

    __slots__ = ("qt", "layer")

    def __init__(self, qt: QTensor, layer):
        self.qt = qt
        self.layer = layer

    def materialize(self) -> QTensor:
        """Per-layer QTensor via dynamic-index (the copying fallback, for
        paths without a stacked kernel)."""
        return jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, self.layer, 0,
                                                   keepdims=False), self.qt)


def qlinear(x, weight, bias=None, op: Optional[OpQuantConfig] = None,
            slot: Optional[str] = None):
    """y = act_out_q( act_in_q(x) @ W^T + b ).

    ``weight`` is (out, in) — a jnp array (bf16 or pre-fake-quantized by
    calibration), a packed QTensor (dequantized here on the XLA path; the
    Pallas fused kernel path lives in kernels/dequant_matmul.py and is
    selected by the engine), or a :class:`LayerSlice` of a stacked QTensor
    (scan serving form — zero-copy layer-indexed kernel). ``slot`` names
    the projection for TP-aware execution (row-parallel slots psum partial
    sums inside a shard_map).
    """
    tp_axis = _TP["axis"]
    row_par = tp_axis is not None and slot in _TP_ROW_SLOTS
    mm_bias = None if row_par else bias

    layer = None
    if isinstance(weight, LayerSlice):
        from ..kernels.w4a8_matmul import supported as _w4a8_sup

        ai = op.act_in if op is not None else None
        kernel_ok = (ai is not None and ai.qtype == "int"
                     and ai.fmt == ElemFormat.int8 and ai.group_size == -1
                     and not ai.zero_point
                     and math.prod(x.shape[:-1]) <= 256
                     and _w4a8_sup(weight.qt))
        if kernel_ok:
            weight, layer = weight.qt, weight.layer
        else:
            weight = weight.materialize()

    if isinstance(weight, QTensor):
        # Packed execution. With int8 per-token act_in, the fused W4A8
        # kernel IS the activation quantizer + integer matmul; otherwise
        # quantize acts as configured and run the dequant-matmul kernel.
        from ..kernels.dequant_matmul import dequant_matmul
        from ..kernels.w4a8_matmul import supported as w4a8_supported
        from ..kernels.w4a8_matmul import w4a8_matmul

        ai = op.act_in if op is not None else None
        # Routing, measured at the flagship shapes (experiments/
        # exp_prefill_path.py, RTT-corrected):
        # * decode M (<= 256 rows): the fused W4A8 integer kernel — the
        #   bf16 paths are weight-DMA-bound there and the integer kernel
        #   reads half the bytes.
        # * prefill M with few K-groups (C/g <= 16): STILL the integer
        #   kernel (int8 MXU has 2x bf16 peak; 198-204 TFLOP/s vs XLA's
        #   180-199) — its per-group VPU scale-accum is O(M*N*C/g), cheap
        #   at <= 16 groups.
        # * prefill M with deep K (down: C/g = 64): plain XLA dequant +
        #   bf16 dot (150 TFLOP/s vs the integer kernel's 90).
        # The dequant-to-bf16 Pallas kernel measured WORST at every
        # prefill shape (67-77 TFLOP/s: per-element VPU dequant repeated
        # per M-tile) — it keeps only the small-M non-int8-act role.
        m_rows = math.prod(x.shape[:-1])
        i8_act = (ai is not None and ai.qtype == "int"
                  and ai.fmt == ElemFormat.int8 and ai.group_size == -1
                  and not ai.zero_point)
        if layer is not None:
            y = w4a8_matmul(x, weight, mm_bias,
                            absmax_axis=tp_axis if row_par else None,
                            layer=layer)
        elif i8_act and w4a8_supported(weight) and (
                m_rows <= 256 or _w4a8_kgroups(weight) <= 16):
            y = w4a8_matmul(x, weight, mm_bias,
                            absmax_axis=tp_axis if row_par else None)
        else:
            if op is not None:
                x = (_quant_global_per_token(op.act_in, x, tp_axis)
                     if row_par and op.act_in.qtype != "dummy"
                     else maybe_quant(op.act_in, x))
            if m_rows > 256:
                # prefill: one XLA dequant of the codes feeds a bf16 MXU
                # dot (the dequant amortizes over the M rows)
                from ..qformats import dequantize

                w = dequantize(weight).astype(x.dtype)
                y = jax.lax.dot_general(
                    x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(x.dtype)
                if mm_bias is not None:
                    y = y + mm_bias.astype(y.dtype)
            else:
                y = dequant_matmul(x, weight, mm_bias)
    else:
        if op is not None:
            x = (_quant_global_per_token(op.act_in, x, tp_axis)
                 if row_par and op.act_in.qtype != "dummy"
                 else maybe_quant(op.act_in, x))
        y = jax.lax.dot_general(
            x, weight,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if mm_bias is not None:
            y = y + mm_bias.astype(y.dtype)
    if row_par:
        y = jax.lax.psum(y, tp_axis)
        if bias is not None:
            y = y + bias.astype(y.dtype)
    if op is not None:
        y = maybe_quant(op.act_out, y)
    return y


def qmatmul_qk(q4, k4t, op: Optional[OpQuantConfig] = None):
    """scores = out_q( in1_q(Q) @ in2_q(K^T) ).

    Q: (B, H, T, D), K^T: (B, H, D, S). Mirrors the reference QMatmul with
    axes=-1: the second operand's quantizer runs row-wise over the last axis
    (qmatmul.py:40-46).
    """
    if op is not None:
        q4 = maybe_quant(op.act_in, q4)
        q2 = op.act_in
        if q2.qtype != "dummy":
            q2 = q2.with_axes_flipped() if q2.eff_axes == -2 else q2
            k4t = quantize_dequant(q2, k4t)
    s = jnp.einsum("bhtd,bhds->bhts", q4, k4t, preferred_element_type=jnp.float32)
    if op is not None:
        s = maybe_quant(op.act_out, s.astype(q4.dtype)).astype(jnp.float32)
    return s


def qmatmul_sv(probs, v4, op: Optional[OpQuantConfig] = None):
    """out = out_q( in1_q(S) @ in2_q(V) ).

    S: (B, H, T, S), V: (B, H, S, D). Mirrors reference QMatmul with
    axes=-2: the second operand (V) is quantized column-wise (per-channel
    over the sequence axis, qmatmul.py:45-46) — this is the KV-quant slot.
    """
    if op is not None:
        probs = maybe_quant(op.act_in, probs)
        q2 = op.act_in
        if q2.qtype != "dummy":
            q2 = q2.with_axes_flipped() if q2.eff_axes == -1 else q2
            v4 = quantize_dequant(q2, v4)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v4, preferred_element_type=jnp.float32)
    if op is not None:
        out = maybe_quant(op.act_out, out.astype(v4.dtype)).astype(jnp.float32)
    return out
