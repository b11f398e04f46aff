"""Shared TPU transformer core for all supported decoder architectures.

One parameterized forward covers Llama / Qwen2 / Qwen3 / Gemma / Gemma2 /
Gemma3 / OPT / BLOOM / Phi (the reference implements nine adapter files;
see SURVEY.md §2.5). Pure functions over a params pytree:

    embed()          tokens -> hidden            (+ positional/embedding LN)
    decoder_layer()  per-layer block             (the calibration unit)
    head()           hidden -> logits            (final norm + lm_head)
    forward()        the full model

Quantization is threaded through via a static
:class:`~llm_compressor_tpu.qformats.QuantConfig`: activation quantizers run
in-graph (dynamic scales per batch — no recompilation), weights are whatever
calibration left in the params (bf16, fake-quantized bf16, or packed
QTensor). Op names follow the reference's module names
("layers.3.self_attn.q_proj", "transformer.h.0.self_attention.dense", …) so
mixed-precision overrides and profiling output are interchangeable.
"""

from __future__ import annotations

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


def _op(qcfg: Optional[QuantConfig], name: str, op_class: str = "linear") -> Optional[OpQuantConfig]:
    if qcfg is None:
        return None
    return qcfg.for_op(name, op_class)


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
    logits = qlinear(h, w, b, _op(qcfg, "lm_head", "head"))
    logits = softcap(logits.astype(jnp.float32), cfg.final_logit_softcapping)
    return logits


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def make_causal_mask(cfg: ModelConfig, layer_idx: int, q_positions, kv_positions):
    """(B, 1, T, S) additive f32 mask (0 / NEG_INF), sliding-window aware."""
    qp = q_positions[:, :, None]   # (B, T, 1)
    kp = kv_positions[:, None, :]  # (B, 1, S)
    keep = kp <= qp
    if cfg.sliding_window is not None and cfg.layer_type(layer_idx) == "sliding_attention":
        keep &= kp > qp - cfg.sliding_window
    return jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)[:, None, :, :]


def attention(
    layer_params: Params,
    cfg: ModelConfig,
    layer_idx: int,
    x: jnp.ndarray,
    cos, sin,
    mask: jnp.ndarray,
    qcfg: Optional[QuantConfig] = None,
) -> jnp.ndarray:
    """Multi-head attention with GQA, rope/alibi, q/k-norm, softcapping.

    Mirrors the reference's eager attention semantics (models/llama.py:30-60)
    including where the QK^T / SV activation quantizers sit.
    """
    B, T, E = x.shape
    names = op_names(cfg, layer_idx)
    ap = layer_params["attn"]
    H, KV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    if cfg.fused_qkv:
        qkv = qlinear(x, ap["qkv"]["weight"], ap["qkv"].get("bias"), _op(qcfg, names["qkv"]))
        qkv = qkv.reshape(B, T, H, 3, D)  # BLOOM interleave: [head, (q,k,v), dim]
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    else:
        q = qlinear(x, ap["q"]["weight"], ap["q"].get("bias"), _op(qcfg, names["q"])).reshape(B, T, H, D)
        k = qlinear(x, ap["k"]["weight"], ap["k"].get("bias"), _op(qcfg, names["k"])).reshape(B, T, KV, D)
        v = qlinear(x, ap["v"]["weight"], ap["v"].get("bias"), _op(qcfg, names["v"])).reshape(B, T, KV, D)

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
        g = H // KV
        k = jnp.broadcast_to(k[:, :, :, None, :], (B, T, KV, g, D)).reshape(B, T, H, D)
        v = jnp.broadcast_to(v[:, :, :, None, :], (B, T, KV, g, D)).reshape(B, T, H, D)

    q4 = q.transpose(0, 2, 1, 3)              # (B, H, T, D)
    k4t = k.transpose(0, 2, 3, 1)             # (B, H, D, S)
    v4 = v.transpose(0, 2, 1, 3)              # (B, H, S, D)

    scale = cfg.attn_scale
    if cfg.arch in ("opt", "bloom"):
        # OPT/BLOOM pre-scale the query before the quantized matmul
        # (reference models/opt.py:113, bloom.py:66-108)
        q4 = q4 * jnp.asarray(scale, q4.dtype)
        scores = qmatmul_qk(q4, k4t, _op(qcfg, names["qk"], "matmul"))
    else:
        scores = qmatmul_qk(q4, k4t, _op(qcfg, names["qk"], "matmul")) * scale

    if cfg.pos_embedding == "alibi":
        kv_pos = jnp.arange(k4t.shape[-1])
        scores = scores + alibi_bias(H, kv_pos)[None, :, :, :]

    scores = softcap(scores, cfg.attn_logit_softcapping)
    scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)

    out = qmatmul_sv(probs, v4, _op(qcfg, names["sv"], "matmul")).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, H * D)
    return qlinear(out, ap["o"]["weight"], ap["o"].get("bias"), _op(qcfg, names["o"]))


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------


def mlp(layer_params: Params, cfg: ModelConfig, layer_idx: int, x,
        qcfg: Optional[QuantConfig] = None):
    names = op_names(cfg, layer_idx)
    mp = layer_params["mlp"]
    if cfg.mlp_style == "gated":
        g = qlinear(x, mp["gate"]["weight"], mp["gate"].get("bias"), _op(qcfg, names["gate"]))
        u = qlinear(x, mp["up"]["weight"], mp["up"].get("bias"), _op(qcfg, names["up"]))
        return qlinear(activation(cfg.hidden_act, g) * u, mp["down"]["weight"],
                       mp["down"].get("bias"), _op(qcfg, names["down"]))
    h = qlinear(x, mp["fc1"]["weight"], mp["fc1"].get("bias"), _op(qcfg, names["fc1"]))
    h = activation(cfg.hidden_act, h)
    return qlinear(h, mp["fc2"]["weight"], mp["fc2"].get("bias"), _op(qcfg, names["fc2"]))


# ---------------------------------------------------------------------------
# Decoder layer + full forward
# ---------------------------------------------------------------------------


def decoder_layer(
    layer_params: Params,
    cfg: ModelConfig,
    layer_idx: int,
    x: jnp.ndarray,
    cos, sin,
    mask: jnp.ndarray,
    qcfg: Optional[QuantConfig] = None,
) -> jnp.ndarray:
    """One decoder block — the unit of layer-by-layer calibration."""
    if cfg.parallel_residual:  # phi: one shared input norm, attn + mlp in parallel
        normed = apply_norm(cfg, x, layer_params["ln1"])
        a = attention(layer_params, cfg, layer_idx, normed, cos, sin, mask, qcfg)
        m = mlp(layer_params, cfg, layer_idx, normed, qcfg)
        return x + a + m

    if cfg.do_layer_norm_before:
        normed = apply_norm(cfg, x, layer_params["ln1"])
        a = attention(layer_params, cfg, layer_idx, normed, cos, sin, mask, qcfg)
    else:  # OPT-350M post-norm
        a = attention(layer_params, cfg, layer_idx, x, cos, sin, mask, qcfg)
    if cfg.post_attn_residual_norm:  # gemma2/3
        a = apply_norm(cfg, a, layer_params["post_attn_norm"])
    x = x + a
    if not cfg.do_layer_norm_before:
        x = apply_norm(cfg, x, layer_params["ln1"])

    if cfg.pre_post_ffw_norm:  # gemma2/3: pre + post feedforward norms
        m = mlp(layer_params, cfg, layer_idx, apply_norm(cfg, x, layer_params["pre_ffw_norm"]), qcfg)
        m = apply_norm(cfg, m, layer_params["post_ffw_norm"])
        x = x + m
    else:
        if cfg.do_layer_norm_before:
            m = mlp(layer_params, cfg, layer_idx, apply_norm(cfg, x, layer_params["ln2"]), qcfg)
            x = x + m
        else:
            m = mlp(layer_params, cfg, layer_idx, x, qcfg)
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


def forward_hidden(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                   qcfg: Optional[QuantConfig] = None,
                   positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full decoder stack, returns last hidden states (pre final-norm)."""
    B, T = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    h = embed(params, cfg, tokens, positions)
    for i, lp in enumerate(params["layers"]):
        cos, sin = rope_for_layer(cfg, i, positions)
        mask = make_causal_mask(cfg, i, positions, positions)
        h = decoder_layer(lp, cfg, i, h, cos, sin, mask, qcfg)
    return h


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            qcfg: Optional[QuantConfig] = None,
            positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """tokens (B, T) -> logits (B, T, vocab)."""
    h = forward_hidden(params, cfg, tokens, qcfg, positions)
    return head(params, cfg, h, qcfg)
