"""Shared TPU transformer core for all supported decoder architectures.

One parameterized forward covers Llama / Qwen2 / Qwen3 / Gemma / Gemma2 /
Gemma3 / OPT / BLOOM / Phi (the reference implements nine adapter files;
see SURVEY.md §2.5). Pure functions over a params pytree:

    embed()          tokens -> hidden            (+ positional/embedding LN)
    decoder_layer()  per-layer block             (the calibration unit)
    head()           hidden -> logits            (final norm + lm_head)
    forward()        the full model

Quantization is threaded through as a static, hashable :class:`LayerOps` —
the per-layer resolution of a :class:`~llm_compressor_tpu.qformats.
QuantConfig` (including mixed-precision overrides). Because LayerOps is a
static jit argument that is *equal across layers* when no per-layer override
exists, layer-by-layer calibration compiles one layer function and reuses it
for the whole stack. Activation quantizers run in-graph (dynamic scales per
batch — no recompilation); weights are whatever calibration left in the
params (bf16, fake-quantized bf16, or packed QTensor).

The ``taps`` dict replaces torch forward hooks: pass a dict and the forward
records each linear's *input* activation under its slot name ("attn_in",
"o_in", "mlp_in", "down_in") — the capture mechanism used by GPTQ / AWQ /
SmoothQuant / Wanda calibration (reference hooks: gptq/core.py:103-127).

Op names follow the reference's torch module names
("layers.3.self_attn.q_proj", "transformer.h.0.self_attention.dense", …) so
mixed-precision overrides and profiling output are interchangeable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..qformats.config import OpQuantConfig, QuantConfig
from .config import ModelConfig
from .layers import (
    activation,
    alibi_bias,
    apply_norm,
    apply_rope,
    qlinear,
    qmatmul_qk,
    qmatmul_sv,
    rms_norm,
    layer_norm,
    rope_cos_sin,
    rope_inv_freq,
    softcap,
)

Params = Dict[str, Any]

NEG_INF = -1e9  # large-negative mask additive (softmax runs in f32)

# Linear slots per architecture family (order = reference find_layers order)
_SLOTS = {
    "gated": ("q", "k", "v", "o", "gate", "up", "down"),
    "mlp": ("q", "k", "v", "o", "fc1", "fc2"),
    "fused": ("qkv", "o", "fc1", "fc2"),
}


def arch_slots(cfg: ModelConfig) -> tuple:
    if cfg.fused_qkv:
        return _SLOTS["fused"]
    return _SLOTS[cfg.mlp_style]


# ---------------------------------------------------------------------------
# Op naming (must match the reference's torch module names for MPQ parity)
# ---------------------------------------------------------------------------


def op_names(cfg: ModelConfig, layer_idx: int) -> Dict[str, str]:
    i = layer_idx
    if cfg.arch in ("llama", "qwen2", "qwen3", "gemma", "gemma2", "gemma3"):
        p = f"layers.{i}"
        return {
            "q": f"{p}.self_attn.q_proj", "k": f"{p}.self_attn.k_proj",
            "v": f"{p}.self_attn.v_proj", "o": f"{p}.self_attn.o_proj",
            "gate": f"{p}.mlp.gate_proj", "up": f"{p}.mlp.up_proj",
            "down": f"{p}.mlp.down_proj",
            "qk": f"{p}.self_attn.qk_matmul", "sv": f"{p}.self_attn.sv_matmul",
        }
    if cfg.arch == "opt":
        p = f"decoder.layers.{i}"
        return {
            "q": f"{p}.self_attn.q_proj", "k": f"{p}.self_attn.k_proj",
            "v": f"{p}.self_attn.v_proj", "o": f"{p}.self_attn.out_proj",
            "fc1": f"{p}.fc1", "fc2": f"{p}.fc2",
            "qk": f"{p}.self_attn.qk_matmul", "sv": f"{p}.self_attn.sv_matmul",
        }
    if cfg.arch == "bloom":
        p = f"transformer.h.{i}"
        return {
            "qkv": f"{p}.self_attention.query_key_value",
            "o": f"{p}.self_attention.dense",
            "fc1": f"{p}.mlp.dense_h_to_4h", "fc2": f"{p}.mlp.dense_4h_to_h",
            "qk": f"{p}.self_attention.qk_matmul", "sv": f"{p}.self_attention.sv_matmul",
        }
    if cfg.arch == "phi":
        p = f"layers.{i}"
        return {
            "q": f"{p}.self_attn.q_proj", "k": f"{p}.self_attn.k_proj",
            "v": f"{p}.self_attn.v_proj", "o": f"{p}.self_attn.dense",
            "fc1": f"{p}.mlp.fc1", "fc2": f"{p}.mlp.fc2",
            "qk": f"{p}.self_attn.qk_matmul", "sv": f"{p}.self_attn.sv_matmul",
        }
    raise ValueError(cfg.arch)


@dataclass(frozen=True)
class LayerOps:
    """Static per-layer quantizer resolution (hashable jit argument).

    ``linears`` maps slot name -> OpQuantConfig for every linear in the
    layer; ``qk``/``sv`` are the attention matmul slots. Identical across
    layers unless mixed-precision overrides name a specific op — so the
    jitted layer function caches across the whole stack.
    """

    linears: tuple  # tuple[(slot, OpQuantConfig), ...]
    qk: Optional[OpQuantConfig] = None
    sv: Optional[OpQuantConfig] = None

    def get(self, slot: str) -> Optional[OpQuantConfig]:
        for s, op in self.linears:
            if s == slot:
                return op
        return None


def layer_ops(cfg: ModelConfig, qcfg: Optional[QuantConfig], layer_idx: int) -> Optional[LayerOps]:
    if qcfg is None:
        return None
    names = op_names(cfg, layer_idx)
    linears = tuple(
        (slot, qcfg.for_op(names[slot], "linear")) for slot in arch_slots(cfg)
    )
    return LayerOps(
        linears=linears,
        qk=qcfg.for_op(names["qk"], "matmul"),
        sv=qcfg.for_op(names["sv"], "matmul"),
    )


def _tap(taps, key, value):
    if taps is not None:
        taps[key] = value


# ---------------------------------------------------------------------------
# Embedding / head
# ---------------------------------------------------------------------------


def embed(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
          positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Token ids (B, T) -> hidden states (B, T, hidden)."""
    h = params["embed"]["weight"][tokens]
    if cfg.embed_scale is not None:
        # Gemma: scale by sqrt(hidden) computed in the embedding dtype
        h = h * jnp.asarray(cfg.embed_scale, dtype=h.dtype)
    if cfg.project_in_dim is not None:
        h = qlinear(h, params["project_in"]["weight"])
    if cfg.pos_embedding == "learned":
        if positions is None:
            positions = jnp.arange(tokens.shape[1])[None, :]
        pos = positions + cfg.learned_pos_offset
        h = h + params["pos_embed"]["weight"][pos]
    if cfg.embedding_layernorm:
        h = apply_norm(cfg, h, params["embed_ln"])
    return h


def head(params: Params, cfg: ModelConfig, h: jnp.ndarray,
         qcfg: Optional[QuantConfig] = None) -> jnp.ndarray:
    """Final norm + lm_head -> logits (B, T, vocab)."""
    if cfg.final_norm and "final_norm" in params:
        h = apply_norm(cfg, h, params["final_norm"])
    if cfg.project_in_dim is not None:
        h = qlinear(h, params["project_out"]["weight"])
    lm = params.get("lm_head")
    if lm is None:  # tied embeddings
        w = params["embed"]["weight"]
        b = None
    else:
        w, b = lm["weight"], lm.get("bias")
    op = qcfg.for_op("lm_head", "head") if qcfg is not None else None
    logits = qlinear(h, w, b, op)
    logits = softcap(logits.astype(jnp.float32), cfg.final_logit_softcapping)
    return logits


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def window_mask(q_positions, kv_positions, window=None) -> jnp.ndarray:
    """(B, T, S) additive f32 causal mask. ``window`` may be None (full
    attention), a static int, or a TRACED scalar — window <= 0 means full
    attention, so per-layer windows can ride a lax.scan as data."""
    qp = q_positions[:, :, None]                       # (B, T, 1)
    kp = kv_positions[:, None, :]                      # (B|1, 1, S)
    keep = kp <= qp
    if window is not None:
        keep &= (window <= 0) | (kp > qp - window)
    return jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)


def layer_window(cfg: ModelConfig, layer_idx: int) -> Optional[int]:
    """Static sliding-window size for one layer (None = full attention)."""
    if (cfg.sliding_window is not None
            and cfg.layer_type(layer_idx) == "sliding_attention"):
        return cfg.sliding_window
    return None


def make_causal_mask(cfg: ModelConfig, layer_idx: int, q_positions, kv_positions):
    """(B, 1, T, S) additive f32 mask (0 / NEG_INF), sliding-window aware."""
    m = window_mask(q_positions, kv_positions, layer_window(cfg, layer_idx))
    return m[:, None, :, :]


def attention(
    layer_params: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,
    cos, sin,
    mask: jnp.ndarray,
    ops: Optional[LayerOps] = None,
    taps: Optional[dict] = None,
) -> jnp.ndarray:
    """Multi-head attention with GQA, rope/alibi, q/k-norm, softcapping.

    Mirrors the reference's eager attention semantics (models/llama.py:30-60)
    including where the QK^T / SV activation quantizers sit.
    """
    B, T, E = x.shape
    ap = layer_params["attn"]
    H, KV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = (lambda s: ops.get(s)) if ops is not None else (lambda s: None)

    _tap(taps, "attn_in", x)
    if cfg.fused_qkv:
        qkv = qlinear(x, ap["qkv"]["weight"], ap["qkv"].get("bias"), g("qkv"))
        qkv = qkv.reshape(B, T, H, 3, D)  # BLOOM interleave: [head, (q,k,v), dim]
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    elif "qkv_cat" in ap:  # serving-fused q|k|v (see fuse_model)
        y = qlinear(x, ap["qkv_cat"]["weight"], ap["qkv_cat"].get("bias"), g("q"))
        hd, kvd = H * D, KV * D
        q = y[..., :hd].reshape(B, T, H, D)
        k = y[..., hd:hd + kvd].reshape(B, T, KV, D)
        v = y[..., hd + kvd:].reshape(B, T, KV, D)
    else:
        q = qlinear(x, ap["q"]["weight"], ap["q"].get("bias"), g("q")).reshape(B, T, H, D)
        k = qlinear(x, ap["k"]["weight"], ap["k"].get("bias"), g("k")).reshape(B, T, KV, D)
        v = qlinear(x, ap["v"]["weight"], ap["v"].get("bias"), g("v")).reshape(B, T, KV, D)

    if cfg.qk_norm:  # per-head-dim RMS norm (qwen3 plain, gemma3 plus-one)
        q = rms_norm(q, ap["q_norm"]["weight"], cfg.rms_norm_eps, cfg.norm_weight_plus_one)
        k = rms_norm(k, ap["k_norm"]["weight"], cfg.rms_norm_eps, cfg.norm_weight_plus_one)
    elif cfg.qk_layernorm:  # phi option
        q = layer_norm(q, ap["q_norm"]["weight"], ap["q_norm"].get("bias"), cfg.rms_norm_eps)
        k = layer_norm(k, ap["k_norm"]["weight"], ap["k_norm"].get("bias"), cfg.rms_norm_eps)

    if cos is not None:
        rot = cfg.rotary_dim
        if rot < D:  # phi partial rotary
            q = jnp.concatenate([apply_rope(q[..., :rot], cos, sin), q[..., rot:]], axis=-1)
            k = jnp.concatenate([apply_rope(k[..., :rot], cos, sin), k[..., rot:]], axis=-1)
        else:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

    # GQA: broadcast KV heads to query heads
    if KV != H:
        r = H // KV
        k = jnp.broadcast_to(k[:, :, :, None, :], (B, T, KV, r, D)).reshape(B, T, H, D)
        v = jnp.broadcast_to(v[:, :, :, None, :], (B, T, KV, r, D)).reshape(B, T, H, D)

    q4 = q.transpose(0, 2, 1, 3)              # (B, H, T, D)
    k4t = k.transpose(0, 2, 3, 1)             # (B, H, D, S)
    v4 = v.transpose(0, 2, 1, 3)              # (B, H, S, D)

    scale = cfg.attn_scale
    qk_op = ops.qk if ops is not None else None
    sv_op = ops.sv if ops is not None else None
    if cfg.arch in ("opt", "bloom"):
        # OPT/BLOOM pre-scale the query before the quantized matmul
        # (reference models/opt.py:113, bloom.py:66-108)
        q4 = q4 * jnp.asarray(scale, q4.dtype)
        _tap(taps, "qk_in1", q4)
        _tap(taps, "qk_in2", k4t)
        scores = qmatmul_qk(q4, k4t, qk_op)
    else:
        _tap(taps, "qk_in1", q4)
        _tap(taps, "qk_in2", k4t)
        scores = qmatmul_qk(q4, k4t, qk_op) * scale

    if cfg.pos_embedding == "alibi":
        kv_pos = jnp.arange(k4t.shape[-1])
        scores = scores + alibi_bias(H, kv_pos)[None, :, :, :]

    scores = softcap(scores, cfg.attn_logit_softcapping)
    scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)

    _tap(taps, "qk_out", scores)
    _tap(taps, "sv_in1", probs)
    _tap(taps, "sv_in2", v4)
    out = qmatmul_sv(probs, v4, sv_op).astype(x.dtype)
    _tap(taps, "sv_out", out)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, H * D)
    _tap(taps, "o_in", out)
    return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), g("o"), slot="o")


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------


def _try_fused_gateup(cfg: ModelConfig, mp, x, gop, taps):
    """Fused gateup + activation kernel dispatch for the STACKED serving
    path (kernels/w4a8_matmul.gateup_silu_matmul): the (M, 2I) concat and
    the (M, I) product never round-trip HBM. Returns h or None (falls to
    the split path). Engages under the same conditions as qlinear's
    integer-kernel route: int8 per-token act_in, dummy act_out, no bias,
    no calibration taps, decode-size M or few K-groups."""
    import math as _math

    from .layers import LayerSlice

    w = mp["gateup"]["weight"]
    if not isinstance(w, LayerSlice) or mp["gateup"].get("bias") is not None \
            or taps is not None or gop is None:
        return None
    ai = gop.act_in
    from ..qformats import ElemFormat as _EF
    if not (ai.qtype == "int" and ai.fmt == _EF.int8 and ai.group_size == -1
            and not ai.zero_point and gop.act_out.qtype == "dummy"):
        return None
    from ..kernels.w4a8_matmul import (
        _dims,
        gateup_silu_matmul,
        gateup_silu_ok,
    )

    # Under shard_map TP the LOCAL gateup slice is its own [gate_s | up_s]
    # concat (fuse_model's shards= interleave, enforced by parallel/tp.py),
    # so the fused kernel applies unchanged to the local shapes — the
    # silu(gate)*up epilogue is elementwise per output row and the K dim
    # is unsharded (column-parallel), so per-row values match the global
    # kernel bitwise (tests/test_tp_shardmap.py).
    if not gateup_silu_ok(w.qt, cfg.hidden_act):
        return None
    m_rows = _math.prod(x.shape[:-1])
    _, C, g_ = _dims(w.qt)
    if m_rows > 256 and C // g_ > 16:
        return None
    return gateup_silu_matmul(x, w.qt, cfg.hidden_act, w.layer)


def mlp(layer_params: Params, cfg: ModelConfig, x,
        ops: Optional[LayerOps] = None, taps: Optional[dict] = None):
    mp = layer_params["mlp"]
    g = (lambda s: ops.get(s)) if ops is not None else (lambda s: None)
    _tap(taps, "mlp_in", x)
    if cfg.mlp_style == "gated":
        if "gateup" in mp:  # serving-fused gate|up (see fuse_model)
            gop = g("gate")
            h = _try_fused_gateup(cfg, mp, x, gop, taps)
            if h is not None:
                _tap(taps, "down_in", h)
                return qlinear(h, mp["down"]["weight"],
                               mp["down"].get("bias"), g("down"),
                               slot="down")
            y = qlinear(x, mp["gateup"]["weight"], mp["gateup"].get("bias"),
                        gop)
            I = y.shape[-1] // 2
            gt, u = y[..., :I], y[..., I:]
        else:
            gt = qlinear(x, mp["gate"]["weight"], mp["gate"].get("bias"), g("gate"))
            u = qlinear(x, mp["up"]["weight"], mp["up"].get("bias"), g("up"))
        h = activation(cfg.hidden_act, gt) * u
        _tap(taps, "down_in", h)
        return qlinear(h, mp["down"]["weight"], mp["down"].get("bias"), g("down"), slot="down")
    h = qlinear(x, mp["fc1"]["weight"], mp["fc1"].get("bias"), g("fc1"))
    h = activation(cfg.hidden_act, h)
    _tap(taps, "down_in", h)
    return qlinear(h, mp["fc2"]["weight"], mp["fc2"].get("bias"), g("fc2"), slot="fc2")


# ---------------------------------------------------------------------------
# Decoder layer + full forward
# ---------------------------------------------------------------------------


def decoder_layer(
    layer_params: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,
    cos, sin,
    mask: jnp.ndarray,
    ops: Optional[LayerOps] = None,
    taps: Optional[dict] = None,
) -> jnp.ndarray:
    """One decoder block — the unit of layer-by-layer calibration."""
    if cfg.parallel_residual:  # phi: one shared input norm, attn + mlp in parallel
        normed = apply_norm(cfg, x, layer_params["ln1"])
        a = attention(layer_params, cfg, normed, cos, sin, mask, ops, taps)
        m = mlp(layer_params, cfg, normed, ops, taps)
        return x + a + m

    if cfg.do_layer_norm_before:
        normed = apply_norm(cfg, x, layer_params["ln1"])
        a = attention(layer_params, cfg, normed, cos, sin, mask, ops, taps)
    else:  # OPT-350M post-norm
        a = attention(layer_params, cfg, x, cos, sin, mask, ops, taps)
    if cfg.post_attn_residual_norm:  # gemma2/3
        a = apply_norm(cfg, a, layer_params["post_attn_norm"])
    x = x + a
    if not cfg.do_layer_norm_before:
        x = apply_norm(cfg, x, layer_params["ln1"])

    if cfg.pre_post_ffw_norm:  # gemma2/3: pre + post feedforward norms
        m = mlp(layer_params, cfg, apply_norm(cfg, x, layer_params["pre_ffw_norm"]), ops, taps)
        m = apply_norm(cfg, m, layer_params["post_ffw_norm"])
        x = x + m
    else:
        if cfg.do_layer_norm_before:
            m = mlp(layer_params, cfg, apply_norm(cfg, x, layer_params["ln2"]), ops, taps)
            x = x + m
        else:
            m = mlp(layer_params, cfg, x, ops, taps)
            x = apply_norm(cfg, x + m, layer_params["ln2"])
    return x


def rope_for_layer(cfg: ModelConfig, layer_idx: int, positions):
    """cos/sin for one layer (None for non-rope models). Gemma3 uses a
    different theta for local-attention layers."""
    if cfg.pos_embedding != "rope":
        return None, None
    theta, scaling = cfg.rope_theta, cfg.rope_scaling
    if (cfg.rope_local_theta is not None
            and cfg.layer_type(layer_idx) == "sliding_attention"):
        theta, scaling = cfg.rope_local_theta, None
    inv = rope_inv_freq(cfg.rotary_dim, theta, scaling)
    return rope_cos_sin(positions, inv)


def uniform_layers(cfg: ModelConfig, qcfg: Optional[QuantConfig]) -> bool:
    """True when every layer has identical static behavior (same rope,
    same masking, same quantizer resolution)."""
    if cfg.sliding_window is not None or cfg.rope_local_theta is not None:
        return False
    if cfg.layer_types and len(set(cfg.layer_types)) > 1:
        return False
    return quant_uniform(cfg, qcfg)


def quant_uniform(cfg: ModelConfig, qcfg: Optional[QuantConfig]) -> bool:
    """True when the quantizer resolution is identical across layers — the
    only per-layer difference that cannot ride a lax.scan as data (LayerOps
    is a STATIC jit argument). Rope-theta and sliding-window differences DO
    scan: see :func:`layer_scan_plan`."""
    if qcfg is not None and qcfg.overrides:
        o0 = layer_ops(cfg, qcfg, 0)
        return all(layer_ops(cfg, qcfg, i) == o0 for i in range(cfg.num_layers))
    return True


def scan_segments(cfg: ModelConfig, qcfg: Optional[QuantConfig]):
    """Maximal contiguous runs of layers with EQUAL LayerOps resolution.

    Returns ``[(start, stop, ops), ...]`` covering ``range(num_layers)``.
    LayerOps is a static jit argument, so it cannot ride a lax.scan as
    data — but mixed-precision overrides (the MPQ registry) almost always
    name contiguous blocks (first layer, last layer, a range). Serving
    scans each run separately: compile count = number of runs, not O(L)
    traced layers (a 2-class MPQ stack decodes via <= #runs scans)."""
    if qcfg is None or not qcfg.overrides:
        return [(0, cfg.num_layers, layer_ops(cfg, qcfg, 0))]
    segs = []
    start, cur = 0, layer_ops(cfg, qcfg, 0)
    for i in range(1, cfg.num_layers):
        o = layer_ops(cfg, qcfg, i)
        if o != cur:
            segs.append((start, i, cur))
            start, cur = i, o
    segs.append((start, cfg.num_layers, cur))
    return segs


def layer_scan_plan(cfg: ModelConfig):
    """Per-layer scan data for non-uniform stacks (gemma2/3, qwen3-sw):

    Returns (rep_layers, sel, windows) where ``rep_layers`` holds one
    representative layer index per distinct layer *type* (for computing the
    per-variant rope stack), ``sel`` is an (L,) int32 variant index, and
    ``windows`` is an (L,) int32 sliding-window size (0 = full attention)
    or None when no layer slides. Masks are NOT precomputed — the window
    scalar is scanned and the mask generated in-graph per layer (a
    materialized (L|U, B, T, S) mask stack would not fuse and costs GBs at
    prefill shapes)."""
    L = cfg.num_layers
    types = [cfg.layer_type(i) for i in range(L)]
    uniq = list(dict.fromkeys(types))
    sel = jnp.asarray([uniq.index(t) for t in types], jnp.int32)
    rep_layers = [types.index(u) for u in uniq]
    if cfg.sliding_window is not None and "sliding_attention" in types:
        windows = jnp.asarray([
            cfg.sliding_window if t == "sliding_attention" else 0
            for t in types], jnp.int32)
    else:
        windows = None
    return rep_layers, sel, windows


def rope_stack(cfg: ModelConfig, rep_layers, positions):
    """(U, B, T, R) cos/sin stacks, one entry per layer variant (gemma3's
    local-theta layers get their own), or (None, None) for non-rope archs."""
    if cfg.pos_embedding != "rope":
        return None, None
    ropes = [rope_for_layer(cfg, r, positions) for r in rep_layers]
    return jnp.stack([c for c, _ in ropes]), jnp.stack([s for _, s in ropes])


def _shard_interleave(arrs, shards: int):
    """Concat [a0_s | a1_s | ...] per shard s along axis 0 — shard s of the
    result (row-sharded over ``shards`` devices) is exactly the fused block
    of each input's shard s (tensor-parallel fused layout)."""
    if shards == 1:
        return jnp.concatenate(arrs, axis=0)
    pieces = []
    for s in range(shards):
        for a in arrs:
            n = a.shape[0] // shards
            pieces.append(a[s * n:(s + 1) * n])
    return jnp.concatenate(pieces, axis=0)


def _concat_linear(entries, axis0_sizes, shards: int = 1):
    """Concatenate linear param dicts along the output dim. Weights may be
    plain arrays or packed QTensors (row-wise group quant: codes and scales
    both concatenate exactly along the N axis). ``shards`` > 1 produces the
    per-shard interleaved layout for tensor-parallel serving — such params
    are only valid on a matching TP mesh."""
    from ..qformats.qtensor import QTensor

    ws = [e["weight"] for e in entries]
    if isinstance(ws[0], QTensor):
        q0 = ws[0]
        N = sum(axis0_sizes)
        zeros = None
        if any(w.zeros is not None for w in ws):
            zeros = _shard_interleave([w.zeros for w in ws], shards)
        from ..qformats.qtensor import scale_strip

        scales = _shard_interleave([w.scales for w in ws], shards)
        shape = (N,) + tuple(q0.shape[1:])
        weight = QTensor(
            codes=_shard_interleave([w.codes for w in ws], shards),
            scales=scales,
            zeros=zeros,
            quantizer=q0.quantizer,
            shape=shape,
            blocked_shape=(N,) + tuple(q0.blocked_shape[1:]),
            group_axis=q0.group_axis,
            ngroups_axis=q0.ngroups_axis,
            dtype=q0.dtype,
            scales_t=scale_strip(q0.quantizer, shape, scales),
            pair_planes=q0.pair_planes,  # concat is along N; the K-axis
        )                                # nibble layout is untouched
    else:
        weight = _shard_interleave(ws, shards)
    out = {"weight": weight}
    if any(e.get("bias") is not None for e in entries):
        dt = ws[0].dtype
        biases = [
            e["bias"] if e.get("bias") is not None else jnp.zeros((n,), dt)
            for e, n in zip(entries, axis0_sizes)
        ]
        out["bias"] = _shard_interleave(biases, shards)
    return out


def _fusible(entries, ops: Optional[LayerOps], slots) -> bool:
    """Slots can fuse when they share one input, identical quantizer
    behavior, and no output-activation quantizer (quantizing the concatenated
    output would change per-token grouping semantics only if grouped over N —
    rw act_out groups along the token axis are safe, but keep it strict)."""
    from ..qformats.qtensor import QTensor

    if ops is not None:
        opcfgs = [ops.get(s) for s in slots]
        if any(o != opcfgs[0] for o in opcfgs[1:]):
            return False
        if opcfgs[0] is not None and opcfgs[0].act_out.qtype != "dummy":
            return False
    ws = [e["weight"] for e in entries]
    if any(isinstance(w, QTensor) != isinstance(ws[0], QTensor) for w in ws):
        return False
    if isinstance(ws[0], QTensor):
        q0 = ws[0]
        if q0.quantizer.eff_axes != -1:
            return False  # column-wise groups don't concat along N exactly
        return all(
            w.quantizer == q0.quantizer
            and tuple(w.shape[1:]) == tuple(q0.shape[1:])
            and tuple(w.blocked_shape[1:]) == tuple(q0.blocked_shape[1:])
            and (w.zeros is None) == (q0.zeros is None)
            for w in ws
        )
    return all(w.ndim == 2 and w.shape[1] == ws[0].shape[1] for w in ws)


def fuse_model(params: Params, cfg: ModelConfig,
               qcfg: Optional[QuantConfig] = None, shards: int = 1) -> Params:
    """Serving transform: concatenate q/k/v into one ``qkv_cat`` projection
    and gate/up into ``gateup`` (per layer, in place).

    One matmul kernel launch and one activation-quant pass replace three
    (resp. two) — decode is launch-overhead-sensitive at small batch. Exact:
    the inputs are shared, row-wise group scales concatenate losslessly along
    the output dim, and the per-token activation quantizer sees the same x.
    Only applied when every layer fuses identically (keeps the lax.scan
    serving form uniform).

    ``shards`` > 1 interleaves the concat per tensor-parallel shard so the
    fused weight row-shards over a ``shards``-way model axis (parallel/tp.py)
    — each device's block is its own [q_s|k_s|v_s]. Such params only run
    correctly under that TP layout."""
    layers = params["layers"]
    if shards > 1 and (cfg.num_heads % shards or cfg.num_kv_heads % shards
                       or cfg.intermediate_size % shards):
        raise ValueError(f"heads/ffn not divisible by shards={shards}")
    can_qkv = not cfg.fused_qkv and all(
        _fusible([lp["attn"][s] for s in ("q", "k", "v")],
                 layer_ops(cfg, qcfg, i), ("q", "k", "v"))
        for i, lp in enumerate(layers)
    )
    can_gu = cfg.mlp_style == "gated" and all(
        _fusible([lp["mlp"][s] for s in ("gate", "up")],
                 layer_ops(cfg, qcfg, i), ("gate", "up"))
        for i, lp in enumerate(layers)
    )
    H, KV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    for lp in layers:
        if can_qkv:
            ap = lp["attn"]
            ap["qkv_cat"] = _concat_linear(
                [ap["q"], ap["k"], ap["v"]], [H * D, KV * D, KV * D],
                shards=shards)
            del ap["q"], ap["k"], ap["v"]
        if can_gu:
            mp = lp["mlp"]
            I = mp["gate"]["weight"].shape[0]
            mp["gateup"] = _concat_linear([mp["gate"], mp["up"]], [I, I],
                                          shards=shards)
            del mp["gate"], mp["up"]
    return params


def split_packed_stacked(tree):
    """Partition a stacked layer tree into (xs_tree, packed): every stacked
    packed QTensor is REMOVED from the xs tree (replaced by None — an empty
    pytree node) and returned in ``packed`` keyed by its key path.

    Packed weights must not ride lax.scan xs: the per-iteration
    dynamic-slice materializes a copy of ~all packed bytes before the
    kernel custom call can read them (+0.73 ms/step at flagship batch-128
    decode, experiments/exp_scan_weight_copy.py). They are captured as
    loop-invariant operands instead, and the layer body re-attaches them as
    :class:`~..models.layers.LayerSlice` views (zero-copy scalar-prefetch
    kernel indexing)."""
    from ..qformats.qtensor import QTensor

    packed = {}

    def walk(node, path):
        if isinstance(node, QTensor):
            packed[path] = node
            return None
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(tree, ()), packed


def reinsert_packed(rest, packed, layer):
    """Rebuild a per-layer tree: each packed entry re-attaches at its path
    as a LayerSlice(stacked_qt, layer) view."""
    from .layers import LayerSlice

    def setpath(d, path, val):
        node = d
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = val

    for path, qt in packed.items():
        setpath(rest, path, LayerSlice(qt, layer))
    return rest


def stack_layers(params: Params):
    """Stack the per-layer pytrees along a leading L axis (for scan)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params["layers"])


def stack_model(params: Params) -> Params:
    """Serving-form params: per-layer list replaced by one stacked pytree
    (halves compile time scaling from O(L) to O(1) via lax.scan)."""
    new = dict(params)
    new["layers_stacked"] = stack_layers(params)
    del new["layers"]
    return new


def forward_hidden(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                   qcfg: Optional[QuantConfig] = None,
                   positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full decoder stack, returns last hidden states (pre final-norm).

    When ``params['layers_stacked']`` is present (see :func:`stack_layers`)
    and the architecture is layer-uniform, the stack runs as ONE
    ``lax.scan`` — compile time independent of depth.
    """
    B, T = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    h = embed(params, cfg, tokens, positions)

    stacked = params.get("layers_stacked")
    if stacked is not None:
        # ONE lax.scan per LayerOps run (one total unless MPQ overrides
        # split the stack — see scan_segments); sliding-window / local-theta
        # stacks scan too: the per-layer rope variant and window size ride
        # the scan as data.
        rep_layers, sel, windows = layer_scan_plan(cfg)
        cos_u, sin_u = rope_stack(cfg, rep_layers, positions)
        win_xs = windows if windows is not None else jnp.zeros(
            (cfg.num_layers,), jnp.int32)

        for s0, s1, ops in scan_segments(cfg, qcfg):
            seg = jax.tree_util.tree_map(lambda x: x[s0:s1], stacked)
            rest, packed = split_packed_stacked(seg)

            def step(carry, xs, ops=ops, packed=packed):
                lp, li, s_i, w_i = xs
                lp = reinsert_packed(lp, packed, li)
                cos = cos_u[s_i] if cos_u is not None else None
                sin = sin_u[s_i] if sin_u is not None else None
                w = w_i if windows is not None else None
                mask = window_mask(positions, positions, w)[:, None]
                return decoder_layer(lp, cfg, carry, cos, sin, mask, ops), None

            h, _ = jax.lax.scan(
                step, h,
                (rest, jnp.arange(s1 - s0), sel[s0:s1], win_xs[s0:s1]))
        return h

    for i, lp in enumerate(params["layers"]):
        cos, sin = rope_for_layer(cfg, i, positions)
        mask = make_causal_mask(cfg, i, positions, positions)
        h = decoder_layer(lp, cfg, h, cos, sin, mask, layer_ops(cfg, qcfg, i))
    return h


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            qcfg: Optional[QuantConfig] = None,
            positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """tokens (B, T) -> logits (B, T, vocab)."""
    h = forward_hidden(params, cfg, tokens, qcfg, positions)
    return head(params, cfg, h, qcfg)
