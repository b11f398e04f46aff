"""Prefill / decode / sampling — the serving path.

Functionally mirrors the reference's generation semantics (top-k filter,
temperature softmax or argmax, EOS stop, chat template —
models/base.py:266-328, utils/module.py:103-125) but executes TPU-natively:
jitted prefill over the prompt and a jitted single-token decode step against
a real (optionally int8-quantized) KV cache, instead of re-encoding a
sliding window per token.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.layers import (
    apply_norm,
    apply_rope,
    alibi_bias,
    layer_norm,
    qlinear,
    rms_norm,
    softcap,
)
from ..models.transformer import (
    LayerOps,
    embed,
    head,
    layer_ops,
    mlp,
    rope_for_layer,
)
from ..qformats.config import QuantConfig
from .kvcache import (
    FreshKV,
    KVCache,
    _quant_i8,
    append_decode,
    append_prefill,
    init_cache,
    init_fresh,
    merge_fresh,
    read,
    write_fresh,
)


# LLMC_SCAN_UNROLL is latched ONCE at import: the jit cache key only
# carries the explicit ``unroll`` argument (0 = "use the default"), so a
# mid-process env-var change would be silently ignored by already-compiled
# executables — latching makes the behavior deterministic per process.
# Pass ``unroll=N`` explicitly to hold several factors in one process
# (see experiments/exp_scan_unroll.py).
import os as _os

_DEFAULT_SCAN_UNROLL = max(1, int(_os.environ.get("LLMC_SCAN_UNROLL", "1")))


def _scan_unroll(unroll: int = 0) -> int:
    """Layer-scan unroll factor: explicit value (clamped to >= 1), else
    the LLMC_SCAN_UNROLL default latched at module import."""
    if unroll:
        return max(1, int(unroll))
    return _DEFAULT_SCAN_UNROLL


def acts_mode(qk_op, sv_op):
    """Map the attention-matmul quantizer configs onto the serving
    decode-attention modes.

    Returns False (exact float math on the dequantized window) when both
    matmuls are unquantized, True (int8-codes attention — per-row int8
    re-quantization of q and of the v-scaled prob rows, the serving form of
    the reference's per-token QK/SV act quantizers, modules/qmatmul.py:33-51)
    when BOTH act_in slots are symmetric int8 per-token with no act_out
    quantizer, and None for anything else (the general XLA fallback
    quantizes acts as configured)."""
    def kind(op):
        if op is None or op.act_in.qtype == "dummy":
            return "none"
        a = op.act_in
        from ..qformats.formats import ElemFormat
        if (a.qtype == "int" and a.fmt == ElemFormat.int8
                and a.group_size == -1 and not a.zero_point and not a.mse
                and op.act_out.qtype == "dummy"):
            return "i8"
        return "other"

    k1, k2 = kind(qk_op), kind(sv_op)
    if k1 == "none" and k2 == "none":
        return False
    if k1 == "i8" and k2 == "i8":
        return True
    return None


def _attn_kernel_ok(cfg: ModelConfig, S: int, ablate=()) -> bool:
    """Static gate for the fused Pallas decode-attention kernel
    (kernels/decode_attention.py): engages on the int8-codes decode paths
    unless a benchmark ablation needs the decomposable XLA epilogue or the
    trace is inside a shard_map TP body (the XLA path handles TP's local
    shapes; kernel-under-shard_map is future work)."""
    from ..kernels.decode_attention import supported
    from ..models.layers import _TP

    if _TP["axis"] is not None:
        return False
    if {"attn", "append", "softmax", "pv"} & set(ablate):
        return False
    return supported(cfg, S)


# Latched ONCE at import (jit caches key on static args; a mid-process env
# flip would be silently ignored by compiled code — ADVICE r4). The round-5
# fused-append attention kernel is DEFAULT-ON: the on-chip A/B never loses
# and its margin grows with context (same-run, RTT-corrected ms/step vs
# the XLA two-part path: 5.251/5.361 at S=256, 6.310/6.629 at S=512,
# 8.018/8.905 at S=1024 — experiments/exp_append_scaling.py, round 5).
# LLMC_ATTN_APPEND=0 is the kill switch back to the XLA two-part path.
_ATTN_APPEND_OPTIN = _os.environ.get("LLMC_ATTN_APPEND", "1") != "0"
# Deferred-write variant (also latched; MEASURED-LOSING, default off):
# the kernel emits only the attention and ONE sublane-slab DUS per STEP
# writes the token rows into the fresh carry after the layer scan. The
# hope was to save the kernel's four fresh outputs + ys stacking
# (~75 us/layer, exp_append_dissect.py) — but the step-carried fresh is
# then an XLA-written buffer that 16 custom calls read, and XLA
# copy-protects it PER KERNEL CALL, not once per step: +3.0 ms/step at
# b128 (8.25 vs 5.26 emit / 5.35 XLA; 11.42 vs 7.97 / 8.91 at S=1024 —
# exp_append_defer.py). Round-4's copy-protection lesson holds for any
# write granularity; functional kernel outputs threaded as ys remain
# the only structure that avoids it. LLMC_ATTN_APPEND_DEFER=1 re-enables
# the probe.
_APPEND_DEFER = _os.environ.get("LLMC_ATTN_APPEND_DEFER", "0") == "1"
# q row-quant runs inside the kernel (bitwise-identical codes; kills the
# XLA prologue ops between opaque per-layer calls). Same-run A/B won
# consistently: 7.55/7.49 vs 7.67/7.64 ms/step at b128
# (exp_append_quantq.py, loaded-chip window). Latched at import;
# LLMC_ATTN_QUANT_Q=0 restores the XLA prologue.
_APPEND_QUANT_Q = _os.environ.get("LLMC_ATTN_QUANT_Q", "1") != "0"
# Alias-accumulator fresh outputs: the kernel writes its layer's fresh
# block straight into the final (L, ...) buffer via WRITE-ONLY
# input_output_aliases (the kernel never reads it — neither round-4
# failure mode applies), carried through the layer scan — removing the
# per-layer ys copies of the "emit" form (~34 us/layer,
# exp_append_dissect.py). Latched at import; default decided by the
# on-chip A/B (exp_append_alias.py).
_APPEND_ALIAS = _os.environ.get("LLMC_ATTN_APPEND_ALIAS", "0") == "1"


def _append_path_ok(cfg: ModelConfig, cache: KVCache, ablate=()) -> bool:
    """Static gate for the round-5 fused-append attention kernel: the
    decode scan's attention + fresh write run as ONE Pallas call per layer
    with the fresh block threaded as layer-scan ys (see _kernel_append).
    Same shape support as the read-only kernel; bench ablations "attn"
    and "append" are handled inside the path; "softmax"/"pv" need the
    decomposable XLA epilogue."""
    from ..kernels.decode_attention import append_supported
    from ..models.layers import _TP

    if not _ATTN_APPEND_OPTIN:
        return False
    if _TP["axis"] is not None:
        return False
    if {"softmax", "pv"} & set(ablate):
        return False
    return append_supported(cfg, cache.max_len)


def _project_qkv(lp, cfg: ModelConfig, x, ops: Optional[LayerOps], cos, sin):
    """QKV projection + q/k norms + rope for a (B, T, E) slice ->
    q (B, T, H, D), k/v (B, T, KV, D). Shared by the carried-cache path and
    the fresh-block decode path."""
    B, T, E = x.shape
    ap = lp["attn"]
    H, KV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = (lambda s: ops.get(s)) if ops is not None else (lambda s: None)

    if cfg.fused_qkv:
        qkv = qlinear(x, ap["qkv"]["weight"], ap["qkv"].get("bias"), g("qkv"))
        qkv = qkv.reshape(B, T, H, 3, D)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    elif "qkv_cat" in ap:  # serving-fused q|k|v (see models.transformer.fuse_model)
        y = qlinear(x, ap["qkv_cat"]["weight"], ap["qkv_cat"].get("bias"), g("q"))
        hd, kvd = H * D, KV * D
        q = y[..., :hd].reshape(B, T, H, D)
        k = y[..., hd:hd + kvd].reshape(B, T, KV, D)
        v = y[..., hd + kvd:].reshape(B, T, KV, D)
    else:
        q = qlinear(x, ap["q"]["weight"], ap["q"].get("bias"), g("q")).reshape(B, T, H, D)
        k = qlinear(x, ap["k"]["weight"], ap["k"].get("bias"), g("k")).reshape(B, T, KV, D)
        v = qlinear(x, ap["v"]["weight"], ap["v"].get("bias"), g("v")).reshape(B, T, KV, D)

    if cfg.qk_norm:
        q = rms_norm(q, ap["q_norm"]["weight"], cfg.rms_norm_eps, cfg.norm_weight_plus_one)
        k = rms_norm(k, ap["k_norm"]["weight"], cfg.rms_norm_eps, cfg.norm_weight_plus_one)
    elif cfg.qk_layernorm:
        q = layer_norm(q, ap["q_norm"]["weight"], ap["q_norm"].get("bias"), cfg.rms_norm_eps)
        k = layer_norm(k, ap["k_norm"]["weight"], ap["k_norm"].get("bias"), cfg.rms_norm_eps)

    if cos is not None:
        rot = cfg.rotary_dim
        if rot < D:
            q = jnp.concatenate([apply_rope(q[..., :rot], cos, sin), q[..., rot:]], axis=-1)
            k = jnp.concatenate([apply_rope(k[..., :rot], cos, sin), k[..., rot:]], axis=-1)
        else:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
    return q, k, v


def _cached_attention(lp, cfg: ModelConfig, layer_idx: int, x, positions,
                      cache: KVCache, start, ops: Optional[LayerOps],
                      cos, sin, mask, window=None, ablate=()):
    """Attention for a (B, T, E) slice at absolute ``positions``, writing
    K/V into the cache (scalar ``start`` for prefill; per-slot scatter when
    ``start`` is None, using positions[:, 0]) and attending over the whole
    cache window. ``cos``/``sin``/``mask``/``window`` are computed by the
    caller — per-layer values may be traced scan data (sliding-window
    archs); ``window`` duplicates the mask's sliding constraint as a scalar
    (<= 0 = full) for the fused decode kernel, which builds its own mask.

    ``ablate`` (static, benchmark-only — see bench.py's time budget) drops
    components to attribute decode-step time: "append" skips the cache
    write, "attn" skips the attention core (scores/softmax/PV; the output
    projection consumes the rope'd queries instead)."""
    B, T, E = x.shape
    ap = lp["attn"]
    H, KV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = (lambda s: ops.get(s)) if ops is not None else (lambda s: None)

    q, k, v = _project_qkv(lp, cfg, x, ops, cos, sin)

    if "append" not in ablate:
        if start is None:  # decode: per-slot scatter at positions (B, T)
            cache = append_decode(cache, layer_idx, k, v, positions)
        else:
            cache = append_prefill(cache, layer_idx, k, v, start)

    if "attn" in ablate:  # benchmark ablation: skip the attention core
        out = q.reshape(B, T, H * D)
        return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), g("o"),
                       slot="o"), cache

    r = H // KV
    scale = cfg.attn_scale
    qk_op = ops.qk if ops is not None else None
    sv_op = ops.sv if ops is not None else None

    # int8-codes decode attention in plain XLA: when both attention matmuls
    # are int8-per-token-quantized (the W4A8 headline config) and the cache
    # is int8, run the QK^T and P.V dots DIRECTLY on the stored codes as
    # native int8 x int8 MXU dot_generals. No dequantized window is ever
    # materialized. A Pallas fused-attention kernel lost its A/B to this
    # path TWICE — round 2's (B, KV) grid paid ~0.9 ms/layer in per-program
    # overheads, and the re-gridded (B/TB,) batch-blocked version still
    # measured ~5% slower at flagship decode shapes (xla_codes 57.7 ms vs
    # pallas 60.6 ms, benchmarks/bench_attention_variants.py, B=128 S=256
    # L=16) — so the kernel was removed from the serving path per VERDICT
    # r2 item 2 (it survives as benchmarks/pallas_decode_attention.py for
    # re-evaluation). Math: per-row absmax int8 quant of q and of
    # probs*v_scale, int32 accumulation, scales applied in f32 epilogues.
    if (cache.quantized and T == 1 and acts_mode(qk_op, sv_op) is True
            and cfg.pos_embedding != "alibi"):
        Kc, Vc = cache.k[layer_idx], cache.v[layer_idx]   # (B, KV, D, S) i8
        ksc = cache.k_scale[layer_idx]                    # (B, KV, 1, S)
        vsc = cache.v_scale[layer_idx]

        def _row_quant(t):
            absmax = jnp.max(jnp.abs(t), axis=-1, keepdims=True)
            s = jnp.maximum(absmax / 127.0, 1e-8)
            return jnp.clip(jnp.round(t / s), -127, 127).astype(jnp.int8), s

        q4 = q.reshape(B, KV, r, D).astype(jnp.float32)
        if cfg.arch == "opt":                 # pre-scaled query (opt.py:113)
            q4 = q4 * scale
            eff_scale = 1.0
        else:
            eff_scale = scale
        # NOTE: no Pallas kernel on this CARRIED path — the cache is
        # scatter-written by append_decode in the same scan body, and a
        # custom call reading an XLA-written carried buffer makes XLA
        # copy-protect it (benchmarks/bench_attention_fresh.py); the
        # all-XLA form fuses freely.
        qi, qs = _row_quant(q4)
        s32 = jax.lax.dot_general(            # (B, KV, r, S) int8 MXU
            qi, Kc, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)
        scores = s32.astype(jnp.float32) * qs * ksc * eff_scale
        scores = softcap(scores, cfg.attn_logit_softcapping)
        scores = scores + mask[:, None]       # (B, T=1, S) -> (B, 1, 1, S)
        # same slimmed epilogue as the fresh path (softcap already applied)
        pis, oscale = _i8_softmax_requant([scores], [vsc], None)
        o32 = jax.lax.dot_general(            # (B, KV, r, D) int8 MXU
            pis[0], Vc, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)
        out = (o32.astype(jnp.float32) * oscale).astype(x.dtype)
        out = out.reshape(B, T, H * D)        # head order h = kv*r + j
        return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), g("o"),
                       slot="o"), cache

    K, V = read(cache, layer_idx, dtype=x.dtype)   # (B, KV, D, S)
    S = K.shape[-1]

    # Grouped-query attention WITHOUT materializing the KV->H broadcast
    # (at decode that broadcast + transposes dominate HBM traffic:
    # ~2*r*S*KV*D bf16 per layer). Query heads grouped (B, T, KV, r, D);
    # contractions run per kv-head group. Numerically identical to the
    # eval path's broadcast attention (models/transformer.py:attention) —
    # the activation quantizers see the same rows (per-token groups are
    # over the last axis, which reshapes preserve).
    q5 = q.reshape(B, T, KV, r, D)
    if cfg.arch in ("opt", "bloom"):
        q5 = q5 * jnp.asarray(scale, q5.dtype)

    from ..models.layers import maybe_quant
    from ..qformats import quantize_dequant

    if qk_op is not None and qk_op.act_in.qtype != "dummy":
        q5 = maybe_quant(qk_op.act_in, q5)
        q2 = qk_op.act_in
        q2 = q2.with_axes_flipped() if q2.eff_axes == -2 else q2
        kt = quantize_dequant(q2, K)                 # (B, KV, D, S)
        scores = jnp.einsum("btkrd,bkds->bkrts", q5, kt,
                            preferred_element_type=jnp.float32)
    else:
        scores = jnp.einsum("btkrd,bkds->bkrts", q5, K,
                            preferred_element_type=jnp.float32)
    if qk_op is not None:
        scores = maybe_quant(qk_op.act_out,
                             scores.astype(x.dtype)).astype(jnp.float32)
    if cfg.arch not in ("opt", "bloom"):
        scores = scores * scale

    kv_pos = jnp.arange(S)
    if cfg.pos_embedding == "alibi":
        # (H, 1, S) -> (1, KV, r, 1, S); head h = kv*r + j ordering
        scores = scores + alibi_bias(H, kv_pos).reshape(KV, r, 1, S)[None]

    scores = softcap(scores, cfg.attn_logit_softcapping)
    scores = scores + mask[:, None, None]    # (B, T, S) -> (B, 1, 1, T, S)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)  # (B,KV,r,T,S)

    if sv_op is not None and sv_op.act_in.qtype != "dummy":
        probs = maybe_quant(sv_op.act_in, probs)
        q2 = sv_op.act_in
        q2 = q2.with_axes_flipped() if q2.eff_axes == -1 else q2
        vt = jnp.transpose(V, (0, 1, 3, 2))          # (B, KV, S, D)
        vt = quantize_dequant(q2, vt)
        out = jnp.einsum("bkrts,bksd->btkrd", probs, vt,
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bkrts,bkds->btkrd", probs, V,
                         preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if sv_op is not None:
        out = maybe_quant(sv_op.act_out, out)
    out = out.reshape(B, T, H * D)
    return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), g("o"), slot="o"), cache


def _cached_layer(lp, cfg: ModelConfig, layer_idx: int, x, positions, cache,
                  start, ops, cos, sin, mask, window=None, ablate=()):
    if cfg.parallel_residual:
        normed = apply_norm(cfg, x, lp["ln1"])
        a, cache = _cached_attention(lp, cfg, layer_idx, normed, positions,
                                     cache, start, ops, cos, sin, mask,
                                     window, ablate)
        m = mlp(lp, cfg, normed, ops)
        return x + a + m, cache

    if cfg.do_layer_norm_before:
        normed = apply_norm(cfg, x, lp["ln1"])
        a, cache = _cached_attention(lp, cfg, layer_idx, normed, positions,
                                     cache, start, ops, cos, sin, mask,
                                     window, ablate)
    else:
        a, cache = _cached_attention(lp, cfg, layer_idx, x, positions,
                                     cache, start, ops, cos, sin, mask,
                                     window, ablate)
    if cfg.post_attn_residual_norm:
        a = apply_norm(cfg, a, lp["post_attn_norm"])
    x = x + a
    if not cfg.do_layer_norm_before:
        x = apply_norm(cfg, x, lp["ln1"])

    if cfg.pre_post_ffw_norm:
        m = mlp(lp, cfg, apply_norm(cfg, x, lp["pre_ffw_norm"]), ops)
        m = apply_norm(cfg, m, lp["post_ffw_norm"])
        x = x + m
    else:
        if cfg.do_layer_norm_before:
            x = x + mlp(lp, cfg, apply_norm(cfg, x, lp["ln2"]), ops)
        else:
            x = apply_norm(cfg, x + mlp(lp, cfg, x, ops), lp["ln2"])
    return x, cache


# ---------------------------------------------------------------------------
# Fresh-block decode (the scan fast path's attention)
#
# Scattering K/V into the scan-carried cache and reading it back in the same
# body forces XLA to copy-protect the cache buffers — measured ~7 ms of a
# 14 ms step at batch 128, while the attention reads alone run at the DMA
# floor (experiments/exp_decode_budget.py). Here the main cache is
# READ-ONLY: the current token's K/V stay in registers, previous steps of
# this call live in a small FreshKV block written at the uniform scan-step
# lane (in-place dynamic_update_slice), and ONE merge scatter lands
# everything after the scan. int8-codes math throughout — the two-part
# [main | fresh] attention epilogue (_i8_softmax_requant) and int32
# partial-dot sums keep tokens and cache CODES bitwise equal to the
# carried-cache path; f32 scales agree to rounding-order ulps (the
# two-part reductions associate differently than one full window —
# tests/test_greedy_steps.py pins both).
# ---------------------------------------------------------------------------


NEG_INF = -1e9


def _i8_softmax_requant(parts_s, parts_vs, softcap_val=None, ablate=()):
    """Shared int8-codes attention epilogue: per-part masked scores ->
    (per-part int8 prob codes, combined output scale (..., 1)).

    ``parts_s`` must arrive softcapped-then-masked: capping AFTER a
    NEG_INF mask turns masked lanes into -cap (tanh(-1e9/cap)*cap) and
    leaks attention mass (ADVICE r4 medium — the gemma2 fresh path bug).
    Every caller caps raw scores itself and passes softcap_val=None; the
    parameter survives only for uncapped/unmasked ablation harnesses.

    Flash-style EXACT two-pass softmax with the normalization folded into
    the output scale (round-4 slimming, VERDICT r3 item 2): with
    e = exp(s - rowmax) UNNORMALIZED, w = e * v_scale, and the int8 row
    quantizer a = rowmax(w)/127, the softmax denominator cancels inside
    round(w/a) — so the (B, KV, r, S) arrays never round-trip HBM for a
    concat, a divide, or a separate abs/absmax pass:

        probs_i8 = round((e*vs) / (max(e*vs)/127))        per part
        out      = (sum_parts dotv(probs_i8, V)) * a / rowsum(e)

    Keeping the window parts separate (main | fresh) also removes the
    score/prob concatenation round-trips of the previous implementation
    (~9.4 MB/layer at the bench shape). Values identical to the explicit
    softmax-then-quantize path up to f32 rounding-order (1 ulp class);
    tokens unchanged (experiments/exp_attn_budget_slim.log A/B)."""
    capped = [softcap(s, softcap_val) for s in parts_s]
    if "softmax" in ablate:   # benchmark ablation: raw scores as "e"
        es = capped
    else:
        m_row = capped[0].max(axis=-1, keepdims=True)
        for s in capped[1:]:
            m_row = jnp.maximum(m_row, s.max(axis=-1, keepdims=True))
        es = [jnp.exp(s - m_row) for s in capped]
    sum_row = sum(e.sum(axis=-1, keepdims=True) for e in es)
    ws = [e * vs for e, vs in zip(es, parts_vs)]
    a_row = ws[0].max(axis=-1, keepdims=True)
    for w in ws[1:]:
        a_row = jnp.maximum(a_row, w.max(axis=-1, keepdims=True))
    a_row = jnp.maximum(a_row / 127.0, 1e-8)
    pis = [jnp.clip(jnp.round(w / a_row), -127, 127).astype(jnp.int8)
           for w in ws]
    return pis, a_row / sum_row


def _fresh_attention(lp, cfg: ModelConfig, layer_idx: int, x, cache: KVCache,
                     fresh: FreshKV, t, len0, ops: LayerOps, cos, sin,
                     window=None, ablate=(), append_mode: bool = False,
                     acc=None):
    """Decode attention for one (B, 1, E) slice against [read-only main
    cache | fresh block | in-register current token]. Requires the int8
    per-token act config on both attention matmuls (acts_mode is True) and
    a quantized cache. Returns (out (B, 1, H*D) o-projected, fresh').

    ``append_mode`` (round 5): the FUSED-APPEND kernel path — ``fresh``
    is then scan-INVARIANT (never written by XLA inside the step) and the
    second return value is layer ``layer_idx``'s updated fresh slice
    tuple (kf', vf', ksf', vsf'), which the caller threads through the
    layer scan as ys (kernels/decode_attention._kernel_append)."""
    B, T, E = x.shape
    ap = lp["attn"]
    H, KV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = (lambda s: ops.get(s)) if ops is not None else (lambda s: None)
    r = H // KV

    q, k, v = _project_qkv(lp, cfg, x, ops, cos, sin)

    # current token in cache layout + codes (identical _quant_i8 values as
    # an append would store — the merge is bitwise the same)
    kc, ks = _quant_i8(k)                    # (B, KV, D, 1), (B, KV, 1, 1)
    vc, vs = _quant_i8(v)

    if append_mode:
        return _fresh_attention_append(
            lp, cfg, layer_idx, q, (kc, vc, ks, vs), cache, fresh, t, len0,
            ops, window, ablate, acc)

    use_kernel = _attn_kernel_ok(cfg, cache.max_len, ablate)
    if "append" not in ablate:
        # the hybrid kernel path reads fresh only from XLA ops, so the
        # write is the plain XLA DUS in both modes
        fresh = write_fresh(fresh, layer_idx, t, kc, vc, ks, vs)

    if "attn" in ablate:  # benchmark ablation: skip the attention core
        out = q.reshape(B, T, H * D)
        return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), g("o"),
                       slot="o"), fresh

    q4 = q.reshape(B, KV, r, D).astype(jnp.float32)
    if cfg.arch == "opt":                    # pre-scaled query (opt.py:113)
        q4 = q4 * cfg.attn_scale
        eff = 1.0
    else:
        eff = cfg.attn_scale

    def _row_quant(tns):
        absmax = jnp.max(jnp.abs(tns), axis=-1, keepdims=True)
        s = jnp.maximum(absmax / 127.0, 1e-8)
        return jnp.clip(jnp.round(tns / s), -127, 127).astype(jnp.int8), s

    if use_kernel:
        # HYBRID Pallas/XLA attention (round 4). The kernel touches ONLY
        # the loop-invariant main cache — any custom call reading a
        # buffer that XLA also writes in the scan body (the FreshKV
        # write) makes XLA copy-protect the whole buffer set
        # (~0.5 ms/layer, whichever side writes first), and in-kernel
        # aliased writes serialize Mosaic's pipeline — so the tiny
        # (B, KV, r, W) fresh side runs in XLA, which fuses its DUS +
        # reads freely. The int8 prob quantizer couples the two parts
        # through the shared row scale ``a``: the fresh side computes
        # masked rowmax stats FIRST, the kernel finishes the coupling
        # and returns (o32_main, m, a, sum_main), and XLA requantizes
        # the fresh probs with the same (m, a). Same math as the
        # all-XLA epilogue up to the exp(m_f - m) rescale rounding
        # (int8 codes may differ by 1 ulp class; tokens unchanged —
        # tests/test_greedy_steps.py).
        from ..kernels.decode_attention import decode_attention_stats

        q_i8, q_s = _row_quant(q4)
        pos = len0 + t
        w = window if window is not None else jnp.int32(0)
        kf_l = fresh.k[layer_idx]                 # (B, KV, W, D)
        vf_l = fresh.v[layer_idx]
        ksf_l = fresh.k_scale[layer_idx]          # (B, KV, 1, W)
        vsf_l = fresh.v_scale[layer_idx]
        W = kf_l.shape[-2]
        s_f = jax.lax.dot_general(
            q_i8, kf_l, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32
        ).astype(jnp.float32) * q_s * ksf_l * eff
        s_f = softcap(s_f, cfg.attn_logit_softcapping)
        sf_ids = jnp.arange(W)[None, :]
        keep_f = (sf_ids <= t) \
            & ((w <= 0) | ((len0[:, None] + sf_ids) > (pos - w)[:, None]))
        s_f = jnp.where(keep_f[:, None, None, :], s_f, NEG_INF)
        m_f = s_f.max(axis=-1, keepdims=True)               # (B,KV,r,1)
        e_f = jnp.exp(s_f - m_f)
        sum_f = e_f.sum(axis=-1, keepdims=True)
        w_f = e_f * vsf_l
        wfm = w_f.max(axis=-1, keepdims=True)

        o32m, m, a, sum_m = decode_attention_stats(
            q_i8, q_s, m_f, wfm, cache.k, cache.v, cache.k_scale,
            cache.v_scale, layer_idx, len0, pos, w, scale=eff,
            softcap=cfg.attn_logit_softcapping)

        r_f = jnp.exp(m_f - m)
        pi_f = jnp.clip(jnp.round(w_f * (r_f / a)), -127, 127
                        ).astype(jnp.int8)
        o32f = jax.lax.dot_general(
            pi_f, vf_l, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)
        denom = sum_m + sum_f * r_f
        out4 = (o32m + o32f.astype(jnp.float32)) * (a / denom)
        out = out4.astype(x.dtype).reshape(B, T, H * D)
        return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), g("o"),
                       slot="o"), fresh

    qi, qs = _row_quant(q4)
    dots = lambda a, b: jax.lax.dot_general(      # (B,KV,r,D).(B,KV,D,S)
        a, b, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)

    Km, Vm = cache.k[layer_idx], cache.v[layer_idx]        # (B, KV, D, S)
    ksm, vsm = cache.k_scale[layer_idx], cache.v_scale[layer_idx]
    Kf, Vf = fresh.k[layer_idx], fresh.v[layer_idx]        # (B, KV, W, D)
    ksf, vsf = fresh.k_scale[layer_idx], fresh.v_scale[layer_idx]
    S, W = Km.shape[-1], Kf.shape[-2]

    # The current token's K/V were just written into the fresh block at
    # lane t (same _quant_i8 codes), so TWO dots cover [main | fresh+cur]
    # — a third current-token dot + its concat lane measured ~0.2 ms/step
    # at batch 128. Only the "append" ablation (fresh not written) still
    # needs the in-register current-token score.
    appended = "append" not in ablate
    pos = len0 + t                                          # (B,)
    w = window if window is not None else jnp.int32(0)
    sm_ids = jnp.arange(S)[None, :]
    keep_m = (sm_ids < len0[:, None]) & ((w <= 0) | (sm_ids > (pos - w)[:, None]))
    sf_ids = jnp.arange(W)[None, :]
    # fresh lane j is step j; lane t IS the current token (always kept —
    # for j == t the window term j > t - w holds for any w > 0)
    keep_f = (sf_ids <= t if appended else sf_ids < t) \
        & ((w <= 0) | ((len0[:, None] + sf_ids) > (pos - w)[:, None]))

    # softcap BEFORE the NEG_INF mask (cap-then-mask, like _cached_attention
    # and HF gemma2): capping after masking turns masked lanes into -cap
    # (tanh(-1e9/cap)*cap), which leaks attention mass when all real capped
    # scores are very negative (ADVICE r4 medium).
    # fresh codes are (B, KV, W, D) — step on sublanes — so the qk dot
    # contracts dim 3 and the pv dot contracts dim 2 (vs 2/3 for the
    # lane-sequence main cache)
    dots_f = lambda a, b: jax.lax.dot_general(    # (B,KV,r,D).(B,KV,W,D)
        a, b, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    sc = cfg.attn_logit_softcapping
    s_m = softcap(dots(qi, Km).astype(jnp.float32) * qs * ksm * eff, sc)
    s_f = softcap(dots_f(qi, Kf).astype(jnp.float32) * qs * ksf * eff, sc)
    parts_s = [s_m, s_f]
    parts_keep = [keep_m, keep_f]
    parts_vs = [vsm, vsf]
    parts_v = [Vm, Vf]
    if not appended:
        parts_s.append(softcap(
            dots(qi, kc).astype(jnp.float32) * qs * ks * eff, sc))
        parts_keep.append(jnp.ones((B, 1), bool))
        parts_vs.append(vs)
        parts_v.append(vc)
    if "softmax" not in ablate:
        parts_s = [jnp.where(k[:, None, None, :], s, NEG_INF)
                   for s, k in zip(parts_s, parts_keep)]
    pis, oscale = _i8_softmax_requant(parts_s, parts_vs, None, ablate)
    if "pv" in ablate:        # benchmark ablation: skip the PV dots
        out = (pis[0][..., :D].astype(jnp.float32) * oscale).astype(x.dtype)
        out = out.reshape(B, T, H * D)
        return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), g("o"),
                       slot="o"), fresh
    dotv = lambda a, b: jax.lax.dot_general(      # (B,KV,r,S).(B,KV,D,S)
        a, b, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    dotv_f = lambda a, b: jax.lax.dot_general(    # (B,KV,r,W).(B,KV,W,D)
        a, b, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    o32 = dotv(pis[0], Vm) + dotv_f(pis[1], Vf)
    if not appended:
        o32 = o32 + dotv(pis[2], vc)                        # int32: exact sum
    out = (o32.astype(jnp.float32) * oscale).astype(x.dtype)
    out = out.reshape(B, T, H * D)            # head order h = kv*r + j
    return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), g("o"),
                   slot="o"), fresh


def _fresh_attention_append(lp, cfg: ModelConfig, layer_idx, q, new_kv,
                            cache: KVCache, fresh: FreshKV, t, len0,
                            ops: LayerOps, window=None, ablate=(),
                            acc=None):
    """Fused-append kernel attention core (round 5): ONE Pallas call per
    layer streams the main window, merges the current token into the
    fresh block in-register, attends over [main | fresh+current], and
    returns the layer's updated fresh slices as functional outputs
    (kernels/decode_attention._kernel_append docstring has the full
    design rationale). ``fresh`` is read-only here; the caller stacks the
    returned slices via layer-scan ys into the next step's fresh."""
    from ..kernels.decode_attention import decode_attention_append

    B, T = q.shape[0], 1
    ap = lp["attn"]
    H, KV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = (lambda s: ops.get(s)) if ops is not None else (lambda s: None)
    r = H // KV

    if "attn" in ablate:  # bench ablation: skip the attention core
        out = q.reshape(B, T, H * D)
        if acc is not None:
            ys = acc
        elif _APPEND_DEFER:
            ys = new_kv
        else:
            ys = (fresh.k[layer_idx], fresh.v[layer_idx],
                  fresh.k_scale[layer_idx], fresh.v_scale[layer_idx])
        return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), g("o"),
                       slot="o"), ys

    q4 = q.reshape(B, KV, r, D).astype(jnp.float32)
    if cfg.arch == "opt":                    # pre-scaled query (opt.py:113)
        q4 = q4 * cfg.attn_scale
        eff = 1.0
    else:
        eff = cfg.attn_scale
    w = window if window is not None else jnp.int32(0)
    if _APPEND_QUANT_Q:
        # q row-quant runs IN-KERNEL (bitwise the same codes); the XLA
        # prologue's ~4 small ops otherwise sit serialized between the
        # opaque per-layer kernel calls
        qi, qscale = q4, jnp.zeros((B, KV, r, 1), jnp.float32)
    else:
        absmax = jnp.max(jnp.abs(q4), axis=-1, keepdims=True)
        qscale = jnp.maximum(absmax / 127.0, 1e-8)
        qi = jnp.clip(jnp.round(q4 / qscale), -127, 127).astype(jnp.int8)

    emit = ("alias" if acc is not None
            else ("none" if _APPEND_DEFER else "emit"))
    o32, slices = decode_attention_append(
        qi, qscale, cache, fresh, new_kv, layer_idx, len0, len0 + t, w, t,
        scale=eff, softcap=cfg.attn_logit_softcapping,
        merge_new="append" not in ablate, emit_fresh=emit,
        quant_q=_APPEND_QUANT_Q, acc=acc)
    out = o32.astype(q.dtype).reshape(B, T, H * D)
    # deferred mode: the ys are the token's K/V rows the engine already
    # holds — the caller DUSes the stacked rows into the fresh carry once
    # per step, after the layer scan
    return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), g("o"),
                   slot="o"), (new_kv if _APPEND_DEFER else slices)


def _fresh_layer(lp, cfg: ModelConfig, layer_idx: int, x, cache, fresh, t,
                 len0, ops, cos, sin, window=None, ablate=(),
                 append_mode: bool = False, acc=None):
    # ``fresh`` return: updated FreshKV (carry) normally; this layer's
    # updated slice tuple (layer-scan ys) in append_mode; the threaded
    # (L, ...) accumulator when ``acc`` is given (alias mode).
    if cfg.parallel_residual:
        normed = apply_norm(cfg, x, lp["ln1"])
        a, fresh = _fresh_attention(lp, cfg, layer_idx, normed, cache, fresh,
                                    t, len0, ops, cos, sin, window, ablate,
                                    append_mode, acc)
        m = mlp(lp, cfg, normed, ops)
        return x + a + m, fresh

    if cfg.do_layer_norm_before:
        normed = apply_norm(cfg, x, lp["ln1"])
        a, fresh = _fresh_attention(lp, cfg, layer_idx, normed, cache, fresh,
                                    t, len0, ops, cos, sin, window, ablate,
                                    append_mode, acc)
    else:
        a, fresh = _fresh_attention(lp, cfg, layer_idx, x, cache, fresh, t,
                                    len0, ops, cos, sin, window, ablate,
                                    append_mode, acc)
    if cfg.post_attn_residual_norm:
        a = apply_norm(cfg, a, lp["post_attn_norm"])
    x = x + a
    if not cfg.do_layer_norm_before:
        x = apply_norm(cfg, x, lp["ln1"])

    if cfg.pre_post_ffw_norm:
        m = mlp(lp, cfg, apply_norm(cfg, x, lp["pre_ffw_norm"]), ops)
        m = apply_norm(cfg, m, lp["post_ffw_norm"])
        x = x + m
    else:
        if cfg.do_layer_norm_before:
            x = x + mlp(lp, cfg, apply_norm(cfg, x, lp["ln2"]), ops)
        else:
            x = apply_norm(cfg, x + mlp(lp, cfg, x, ops), lp["ln2"])
    return x, fresh


def _forward_decode_fresh(params, cfg: ModelConfig, tokens, cache: KVCache,
                          fresh: FreshKV, t, qcfg, ablate=(), unroll=0):
    """One decode step over the stacked-layer scan with the read-only main
    cache + fresh block. Returns (logits (B, V) — or hidden states when the
    head is ablated — and the updated fresh block).

    ``unroll`` (0 = the LLMC_SCAN_UNROLL default) unrolls the layer scan:
    a decode layer body is ~150 latency-bound small ops around 4 kernel
    calls, and a wider basic block lets XLA overlap glue with weight DMAs
    across layers (experiments/exp_scan_unroll.py measures the A/B)."""
    from ..models.transformer import (
        layer_scan_plan,
        reinsert_packed,
        rope_stack,
        scan_segments,
        split_packed_stacked,
    )

    B, T = tokens.shape
    len0 = cache.lengths
    positions = (len0 + t)[:, None]                         # (B, 1)
    h = embed(params, cfg, tokens, positions)

    stacked = params["layers_stacked"]
    rep_layers, sel, windows = layer_scan_plan(cfg)
    cos_u, sin_u = rope_stack(cfg, rep_layers, positions)
    win_xs = windows if windows is not None else jnp.zeros(
        (cfg.num_layers,), jnp.int32)

    append_mode = _append_path_ok(cfg, cache, ablate)
    fresh_ys = []
    for s0, s1, ops in scan_segments(cfg, qcfg):
        seg = jax.tree_util.tree_map(lambda x: x[s0:s1], stacked)
        rest, packed = split_packed_stacked(seg)

        if append_mode:
            # FUSED-APPEND mode (round 5): fresh is scan-INVARIANT (the
            # kernel reads it via scalar-prefetch layer indexing, nothing
            # writes it inside the step) and each layer's updated slices
            # come back as ys — stacked, they ARE the next step's fresh.
            # No XLA-write/kernel-read pair exists, so neither the
            # copy-protection (~525 us/layer) nor the aliased-write
            # serialization (~174 us/layer) of the round-4 table applies.
            # Alias mode (_APPEND_ALIAS): the kernel instead writes its
            # layer's block straight into a carried (L, ...) accumulator
            # via write-only input_output_aliases — no ys copies.
            if _APPEND_ALIAS:
                if not fresh_ys:  # one accumulator threads ALL segments
                    acc0 = (jnp.zeros_like(fresh.k),
                            jnp.zeros_like(fresh.v),
                            jnp.zeros_like(fresh.k_scale),
                            jnp.zeros_like(fresh.v_scale))
                    fresh_ys.append(list(acc0))

                def step_al(carry, xs, ops=ops, packed=packed, s0=s0):
                    hh, ac = carry
                    lp, li, s_i, w_i = xs
                    lp = reinsert_packed(lp, packed, li - s0)
                    cos = cos_u[s_i] if cos_u is not None else None
                    sin = sin_u[s_i] if sin_u is not None else None
                    w = w_i if windows is not None else None
                    hh, ac = _fresh_layer(lp, cfg, li, hh, cache, fresh, t,
                                          len0, ops, cos, sin, w, ablate,
                                          append_mode=True, acc=ac)
                    return (hh, tuple(ac)), None

                (h, acc_out), _ = jax.lax.scan(
                    step_al, (h, tuple(fresh_ys[0])),
                    (rest, jnp.arange(s0, s1), sel[s0:s1], win_xs[s0:s1]),
                    unroll=_scan_unroll(unroll))
                fresh_ys[0] = list(acc_out)
                continue

            def step_a(hh, xs, ops=ops, packed=packed, s0=s0):
                lp, li, s_i, w_i = xs
                lp = reinsert_packed(lp, packed, li - s0)
                cos = cos_u[s_i] if cos_u is not None else None
                sin = sin_u[s_i] if sin_u is not None else None
                w = w_i if windows is not None else None
                hh, fr_sl = _fresh_layer(lp, cfg, li, hh, cache, fresh, t,
                                         len0, ops, cos, sin, w, ablate,
                                         append_mode=True)
                return hh, fr_sl

            h, ys = jax.lax.scan(
                step_a, h,
                (rest, jnp.arange(s0, s1), sel[s0:s1], win_xs[s0:s1]),
                unroll=_scan_unroll(unroll))
            fresh_ys.append(ys)
            continue

        def step(carry, xs, ops=ops, packed=packed, s0=s0):
            hh, fr = carry
            lp, li, s_i, w_i = xs
            lp = reinsert_packed(lp, packed, li - s0)
            cos = cos_u[s_i] if cos_u is not None else None
            sin = sin_u[s_i] if sin_u is not None else None
            w = w_i if windows is not None else None
            hh, fr = _fresh_layer(lp, cfg, li, hh, cache, fr, t, len0, ops,
                                  cos, sin, w, ablate)
            return (hh, fr), None

        (h, fresh), _ = jax.lax.scan(
            step, (h, fresh),
            (rest, jnp.arange(s0, s1), sel[s0:s1], win_xs[s0:s1]),
            unroll=_scan_unroll(unroll))
    if append_mode:
        if _APPEND_ALIAS:
            k_, v_, ks_, vs_ = fresh_ys[0]
            return_fresh = FreshKV(k=k_, v=v_, k_scale=ks_, v_scale=vs_)
            if "head" in ablate:
                return h[:, -1, :], return_fresh
            logits = head(params, cfg, h, qcfg)
            return logits[:, -1, :], return_fresh
        cat = (fresh_ys[0] if len(fresh_ys) == 1 else
               tuple(jnp.concatenate([seg[i] for seg in fresh_ys])
                     for i in range(4)))
        if _APPEND_DEFER:
            # ONE sublane-slab write per STEP: DUS the stacked token rows
            # (L, B, KV, D, 1) into the fresh carry at step t. Worst case
            # XLA copy-protects the fresh set once per step (~9 MB at the
            # bench shape ≈ 1 us/layer) — vs the ~75 us/layer the kernel
            # fresh outputs + full-block ys cost (exp_append_dissect.py).
            if "append" not in ablate:
                rk, rv, rks, rvs = cat
                L_, B_, KV_, D_, _ = rk.shape
                row = lambda r: r.reshape(L_, B_, KV_, 1, D_)
                fresh = fresh.replace(
                    k=jax.lax.dynamic_update_slice(
                        fresh.k, row(rk).astype(fresh.k.dtype),
                        (0, 0, 0, t, 0)),
                    v=jax.lax.dynamic_update_slice(
                        fresh.v, row(rv).astype(fresh.v.dtype),
                        (0, 0, 0, t, 0)),
                    k_scale=jax.lax.dynamic_update_slice(
                        fresh.k_scale, rks, (0, 0, 0, 0, t)),
                    v_scale=jax.lax.dynamic_update_slice(
                        fresh.v_scale, rvs, (0, 0, 0, 0, t)))
        else:
            fresh = FreshKV(k=cat[0], v=cat[1], k_scale=cat[2],
                            v_scale=cat[3])
    if "head" in ablate:
        return h[:, -1, :], fresh
    logits = head(params, cfg, h, qcfg)
    return logits[:, -1, :], fresh


def fresh_path_ok(params, cfg: ModelConfig, cache: KVCache,
                  qcfg: Optional[QuantConfig]) -> bool:
    """Static eligibility of the fresh-block decode fast path: stacked
    layers, int8 cache, int8 per-token act config on both attention
    matmuls (the W4A8 headline) in EVERY LayerOps run (MPQ overrides may
    split the stack into several scans — scan_segments — but each must
    still satisfy the int8-codes attention contract), no ALiBi (BLOOM
    scores need the bias over absolute positions — stays on the
    carried-cache path). LLMC_NO_FRESH=1 forces the carried-cache path
    (A/B benchmarking)."""
    import os

    from ..models.transformer import scan_segments

    if os.environ.get("LLMC_NO_FRESH"):
        return False
    if params.get("layers_stacked") is None:
        return False
    if not cache.quantized or cfg.pos_embedding == "alibi":
        return False
    return all(ops is not None and acts_mode(ops.qk, ops.sv) is True
               for _, _, ops in scan_segments(cfg, qcfg))


def _forward_cached(params, cfg: ModelConfig, tokens, cache: KVCache, start,
                    qcfg: Optional[QuantConfig], ablate=(),
                    head_last: bool = False):
    """``head_last``: compute the lm head only for the LAST position —
    prefill needs one row of logits but the packed head kernel is opaque
    to XLA's slice-push, so without the explicit slice the 128k-vocab
    head runs over every prompt position (~20% of prefill FLOPs at the
    bench shape). Verify steps (speculative) need all T logits and keep
    the default."""
    from ..models.transformer import (
        layer_scan_plan,
        layer_window,
        reinsert_packed,
        rope_stack,
        scan_segments,
        split_packed_stacked,
        window_mask,
    )

    B, T = tokens.shape
    if start is None:  # decode: per-slot positions from cache lengths
        # T > 1 = speculative verify step (all T candidate tokens scored in
        # one forward; the cache scatter lands them at per-slot offsets)
        positions = cache.lengths[:, None] + jnp.arange(T)[None, :]
    else:
        positions = jnp.broadcast_to(start + jnp.arange(T)[None, :], (B, T))
    h = embed(params, cfg, tokens, positions)
    kv_pos = jnp.arange(cache.max_len)[None, :]

    stacked = params.get("layers_stacked")
    if stacked is not None:
        # ONE lax.scan per LayerOps run over the stacked layers: compile
        # time O(#runs) in depth (one run unless MPQ overrides split the
        # stack — scan_segments). Sliding-window / local-theta archs
        # (gemma2/3, qwen3-sw) scan too: the per-layer rope variant and
        # window scalar ride as scan data, and the cache write uses the
        # scanned layer index.
        rep_layers, sel, windows = layer_scan_plan(cfg)
        cos_u, sin_u = rope_stack(cfg, rep_layers, positions)
        win_xs = windows if windows is not None else jnp.zeros(
            (cfg.num_layers,), jnp.int32)

        for s0, s1, ops in scan_segments(cfg, qcfg):
            seg = jax.tree_util.tree_map(lambda x: x[s0:s1], stacked)
            rest, packed = split_packed_stacked(seg)

            def step(carry, xs, ops=ops, packed=packed, s0=s0):
                hh, cc = carry
                lp, li, s_i, w_i = xs
                lp = reinsert_packed(lp, packed, li - s0)
                cos = cos_u[s_i] if cos_u is not None else None
                sin = sin_u[s_i] if sin_u is not None else None
                w = w_i if windows is not None else None
                mask = window_mask(positions, kv_pos, w)
                hh, cc = _cached_layer(lp, cfg, li, hh, positions, cc, start,
                                       ops, cos, sin, mask, w, ablate)
                return (hh, cc), None

            (h, cache), _ = jax.lax.scan(
                step, (h, cache),
                (rest, jnp.arange(s0, s1), sel[s0:s1], win_xs[s0:s1]))
    else:
        for i, lp in enumerate(params["layers"]):
            cos, sin = rope_for_layer(cfg, i, positions)
            w = layer_window(cfg, i)
            mask = window_mask(positions, kv_pos, w)
            h, cache = _cached_layer(lp, cfg, i, h, positions, cache, start,
                                     layer_ops(cfg, qcfg, i), cos, sin, mask,
                                     w, ablate)
    if "head" in ablate:  # benchmark ablation: hidden states stand in for
        return h, cache   # logits (argmax over E < vocab stays a valid id)
    if head_last:
        h = h[:, -1:, :]
    logits = head(params, cfg, h, qcfg)
    return logits, cache


@partial(jax.jit, static_argnames=("cfg", "qcfg"), donate_argnums=(2,))
def prefill(params, tokens, cache: KVCache, *, cfg: ModelConfig,
            qcfg: Optional[QuantConfig] = None):
    """Encode the prompt; returns (last-position logits (B, V), cache)."""
    logits, cache = _forward_cached(params, cfg, tokens, cache, jnp.int32(0),
                                    qcfg, head_last=True)
    cache = cache.replace(lengths=jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32))
    return logits[:, -1, :], cache


@partial(jax.jit, static_argnames=("cfg", "qcfg"), donate_argnums=(2,))
def decode_step(params, token, cache: KVCache, *, cfg: ModelConfig,
                qcfg: Optional[QuantConfig] = None):
    """One token (B, 1) -> (logits (B, V), cache)."""
    logits, cache = _forward_cached(params, cfg, token, cache, None, qcfg)
    cache = cache.replace(lengths=cache.lengths + 1)
    return logits[:, -1, :], cache


@partial(jax.jit, static_argnames=("n", "cfg", "qcfg", "ablate", "unroll"),
         donate_argnums=(2,))
def decode_greedy_steps(params, token, cache: KVCache, *, n: int,
                        cfg: ModelConfig, qcfg: Optional[QuantConfig] = None,
                        ablate: tuple = (), unroll: int = 0):
    """``n`` greedy decode steps inside ONE jit (lax.scan with the argmax
    token fed back) -> (tokens (B, n), cache). ``tokens[:, i]`` is the
    argmax AFTER consuming ``token`` and i generated predecessors.

    Per-dispatch latency over the axon tunnel measured ~5 ms; batching steps
    into one dispatch amortizes it. Use for greedy/batch generation; the
    per-step ``decode_step`` remains for sampling / EOS-reactive loops.

    ``unroll=0`` uses the LLMC_SCAN_UNROLL default, which is latched ONCE
    at module import — changing the env var later in the process has no
    effect (pass ``unroll`` explicitly instead).

    ``ablate`` is benchmark-only (subset of {"head", "attn", "append"}):
    drops components so bench.py can attribute step time; generated tokens
    are then meaningless (but still a full non-reassociable dependency on
    every surviving component — the argmax feeds the next step's embed).

    On the W4A8 headline config (stacked uniform layers, int8 cache, int8
    per-token attention acts) the steps run on the FRESH-BLOCK path: the
    main cache is read-only inside the scan (new tokens accumulate in a
    small FreshKV block, merged once at the end) — bitwise the same tokens
    and cache codes (f32 cache scales agree to rounding-order ulps),
    ~2.8x faster at batch 128 (the per-step scatter into the carried
    cache made XLA copy-protect the buffers; see
    experiments/exp_decode_budget.py)."""
    if fresh_path_ok(params, cfg, cache, qcfg):
        len0 = cache.lengths
        fresh = init_fresh(cfg.num_layers, cache.batch, n, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)

        def body_fresh(carry, t):
            tok, fr = carry
            logits, fr = _forward_decode_fresh(params, cfg, tok, cache, fr,
                                               t, qcfg, ablate, unroll)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return (nxt, fr), nxt[:, 0]

        (tok, fresh), toks = jax.lax.scan(body_fresh, (token, fresh),
                                          jnp.arange(n))
        if "append" not in ablate:
            cache = merge_fresh(cache, fresh, len0, n)
        else:
            cache = cache.replace(lengths=len0 + n)
        return jnp.swapaxes(toks, 0, 1), cache

    def body(carry, _):
        tok, cc = carry
        logits, cc = _forward_cached(params, cfg, tok, cc, None, qcfg,
                                     ablate)
        cc = cc.replace(lengths=cc.lengths + 1)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        return (nxt, cc), nxt[:, 0]

    (tok, cache), toks = jax.lax.scan(body, (token, cache), length=n)
    return jnp.swapaxes(toks, 0, 1), cache


def _sample(logits, temperature: float, top_k: Optional[int], key):
    """Reference sampling semantics (models/base.py:289-313)."""
    if top_k is not None:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if temperature > 0.0:
        return jax.random.categorical(key, logits / temperature, axis=-1)
    return jnp.argmax(logits, axis=-1)


def generate(params, cfg: ModelConfig, prompt_tokens: np.ndarray,
             max_new_tokens: int = 100, temperature: float = 0.0,
             top_k: Optional[int] = None, eos_id: Optional[int] = None,
             qcfg: Optional[QuantConfig] = None, quantized_kv: bool = False,
             max_len: Optional[int] = None, seed: int = 0) -> np.ndarray:
    """Autoregressive generation with a real KV cache. Returns the full
    token sequence (prompt + generated) as (B, T_out)."""
    B, T = prompt_tokens.shape
    max_len = max_len or (T + max_new_tokens)
    cache = init_cache(cfg.num_layers, B, max_len, cfg.num_kv_heads, cfg.head_dim,
                       quantized=quantized_kv)
    key = jax.random.PRNGKey(seed)
    logits, cache = prefill(params, jnp.asarray(prompt_tokens), cache, cfg=cfg, qcfg=qcfg)
    out = [np.asarray(prompt_tokens)]
    for _ in range(max_new_tokens):
        key, sub = jax.random.split(key)
        nxt = _sample(logits, temperature, top_k, sub)
        nxt_np = np.asarray(nxt)
        if eos_id is not None and int(nxt_np[0]) == eos_id:
            break
        out.append(nxt_np[:, None])
        logits, cache = decode_step(params, nxt[:, None], cache, cfg=cfg, qcfg=qcfg)
    return np.concatenate(out, axis=1)


CHAT_TEMPLATE = """Below is an instruction that describes a task.
Write a response that appropriately completes the request.

### Instruction:
{message}
"""


def generate_text(params, cfg: ModelConfig, tokenizer, prompt: str,
                  max_new_tokens: int = 100, temperature: float = 0.0,
                  top_k: Optional[int] = None, qcfg: Optional[QuantConfig] = None,
                  quantized_kv: bool = False, use_chat_template: bool = True,
                  speculative: bool = False, k_draft: int = 4) -> str:
    """Chat-templated text generation (reference tinychat path).

    ``speculative`` routes greedy decoding through prompt-lookup
    speculative decoding (engine/speculative.py — greedy-exact, so it is
    only taken at temperature 0)."""
    text = CHAT_TEMPLATE.format(message=prompt) if use_chat_template else prompt
    ids = np.asarray([tokenizer.encode(text)], dtype=np.int32)
    if speculative and temperature == 0.0:
        from .speculative import generate_speculative

        hist, spec_stats = generate_speculative(
            params, cfg, ids, max_new_tokens=max_new_tokens,
            k_draft=k_draft, eos_id=tokenizer.eos_token_id, qcfg=qcfg,
            quantized_kv=quantized_kv)
        # accept-rate telemetry (VERDICT r4 item 6): the break-even the
        # feature will be judged on when real checkpoints are available
        # is mean_accepted >= ~0.3*k over a window; below it the loop
        # auto-falls back to scan decode (see generate_speculative).
        from ..utils.logging import LOGGER
        LOGGER.info(
            "speculative: mean_accepted={:.2f}/{} over {} live rounds"
            "{}".format(spec_stats["mean_accepted"], k_draft,
                        spec_stats["live_rounds"],
                        " (fell back to scan decode)"
                        if spec_stats["fell_back"] else ""))
        out = np.asarray([hist[0]], dtype=np.int32)
    else:
        out = generate(params, cfg, ids, max_new_tokens=max_new_tokens,
                       temperature=temperature, top_k=top_k,
                       eos_id=tokenizer.eos_token_id, qcfg=qcfg,
                       quantized_kv=quantized_kv)
    full = tokenizer.decode(out[0].tolist(), skip_special_tokens=True)
    return full[len(text):].replace("### Response:", "").strip()
