"""Model configuration covering all supported decoder architectures.

One :class:`ModelConfig` drives the shared TPU transformer core
(transformer.py); per-architecture behavior (GQA, q/k-norm, logit
softcapping, sliding windows, ALiBi, partial rotary, fused QKV, parallel
residual, learned positions) is expressed as static flags so XLA traces only
the active branches. This replaces the reference's nine per-arch adapter
files (reference: llm_compressor/models/{opt,bloom,phi,llama,qwen2,qwen3,
gemma,gemma2,gemma3}.py) with data.

``from_hf_config`` maps a HuggingFace ``PretrainedConfig`` (or plain dict)
into a :class:`ModelConfig`, so any local HF checkpoint of the supported
families loads without arch-specific code.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

SUPPORTED_ARCHS = (
    "llama", "qwen2", "qwen3", "gemma", "gemma2", "gemma3", "opt", "bloom", "phi",
)


@dataclass(frozen=True)
class RopeScaling:
    kind: str = "default"          # "default" | "llama3"
    factor: float = 1.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position: int = 8192


@dataclass(frozen=True)
class ModelConfig:
    arch: str
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    max_position_embeddings: int = 2048

    # activations / norms
    hidden_act: str = "silu"            # silu | gelu | gelu_new | gelu_tanh | relu
    norm_type: str = "rmsnorm"          # rmsnorm | layernorm
    rms_norm_eps: float = 1e-6
    norm_weight_plus_one: bool = False  # gemma-style (1 + w) rmsnorm
    mlp_style: str = "gated"            # gated (gate/up/down) | mlp (fc1/fc2)

    # positions
    pos_embedding: str = "rope"         # rope | learned | alibi
    rope_theta: float = 10000.0
    rope_scaling: Optional[RopeScaling] = None
    partial_rotary_factor: float = 1.0
    rope_local_theta: Optional[float] = None  # gemma3: local-attn layers' theta
    learned_pos_offset: int = 0         # OPT: positions offset by 2

    # attention
    attention_bias: bool = False
    attention_out_bias: bool = False
    mlp_bias: bool = False
    qk_norm: bool = False               # qwen3/gemma3 RMS q/k-norm (per head_dim)
    qk_layernorm: bool = False          # phi option (LayerNorm over head_dim)
    query_pre_attn_scalar: Optional[float] = None  # gemma2/3 custom scaling
    attn_logit_softcapping: Optional[float] = None  # gemma2
    final_logit_softcapping: Optional[float] = None  # gemma2
    sliding_window: Optional[int] = None
    layer_types: Tuple[str, ...] = ()   # per-layer "full_attention"/"sliding_attention"
    fused_qkv: bool = False             # bloom: single query_key_value projection

    # layer layout
    parallel_residual: bool = False     # phi: attn and mlp share one input norm
    pre_post_ffw_norm: bool = False     # gemma2/3: pre+post feedforward norms
    post_attn_residual_norm: bool = False  # gemma2/3: norm applied to attn output
    do_layer_norm_before: bool = True   # OPT flag
    final_norm: bool = True
    embedding_layernorm: bool = False   # bloom: LN right after word embeddings
    embed_scale: Optional[float] = None  # gemma: hidden *= sqrt(hidden_size)
    project_in_dim: Optional[int] = None  # OPT-350M word_embed_proj_dim
    tie_word_embeddings: bool = True

    dtype: str = "bfloat16"

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @property
    def attn_scale(self) -> float:
        if self.query_pre_attn_scalar is not None:
            return self.query_pre_attn_scalar ** -0.5
        return self.head_dim ** -0.5

    def layer_type(self, i: int) -> str:
        if self.layer_types:
            return self.layer_types[i]
        if self.sliding_window is not None and self.arch == "gemma2":
            return "sliding_attention" if i % 2 == 0 else "full_attention"
        return "full_attention"


def _rope_scaling_from_hf(rs) -> Optional[RopeScaling]:
    if rs is None:
        return None
    if not isinstance(rs, dict):
        rs = dict(rs)
    kind = rs.get("rope_type", rs.get("type", "default"))
    if kind == "default":
        return None
    return RopeScaling(
        kind=kind,
        factor=rs.get("factor", 1.0),
        low_freq_factor=rs.get("low_freq_factor", 1.0),
        high_freq_factor=rs.get("high_freq_factor", 4.0),
        original_max_position=rs.get("original_max_position_embeddings", 8192),
    )


def from_hf_config(hf) -> ModelConfig:
    """Build a ModelConfig from a HuggingFace config object or dict."""
    get = (lambda k, d=None: hf.get(k, d)) if isinstance(hf, dict) else (
        lambda k, d=None: getattr(hf, k, d)
    )
    mt = get("model_type")
    if mt in ("llama", "qwen2", "qwen3"):
        heads = get("num_attention_heads")
        return ModelConfig(
            arch=mt,
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=heads,
            num_kv_heads=get("num_key_value_heads", heads),
            head_dim=get("head_dim") or get("hidden_size") // heads,
            max_position_embeddings=get("max_position_embeddings", 2048),
            hidden_act=get("hidden_act", "silu"),
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            rope_theta=get("rope_theta", 10000.0),
            rope_scaling=_rope_scaling_from_hf(get("rope_scaling")),
            attention_bias=get("attention_bias", mt == "qwen2"),
            attention_out_bias=False,
            qk_norm=(mt == "qwen3"),
            sliding_window=get("sliding_window") if get("use_sliding_window", False) else None,
            tie_word_embeddings=get("tie_word_embeddings", False),
        )
    if mt in ("gemma", "gemma2", "gemma3", "gemma3_text"):
        arch = "gemma3" if mt == "gemma3_text" else mt
        heads = get("num_attention_heads")
        hidden = get("hidden_size")
        qpas = get("query_pre_attn_scalar")
        layer_types = tuple(get("layer_types") or ())
        return ModelConfig(
            arch=arch,
            vocab_size=get("vocab_size"),
            hidden_size=hidden,
            intermediate_size=get("intermediate_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=heads,
            num_kv_heads=get("num_key_value_heads", heads),
            head_dim=get("head_dim") or hidden // heads,
            max_position_embeddings=get("max_position_embeddings", 8192),
            hidden_act=(get("hidden_activation") or get("hidden_act") or "gelu_pytorch_tanh"),
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            norm_weight_plus_one=True,
            rope_theta=get("rope_theta", 10000.0),
            rope_local_theta=get("rope_local_base_freq") if arch == "gemma3" else None,
            rope_scaling=_rope_scaling_from_hf(get("rope_scaling")),
            query_pre_attn_scalar=qpas if arch in ("gemma2", "gemma3") else None,
            attn_logit_softcapping=get("attn_logit_softcapping") if arch == "gemma2" else None,
            final_logit_softcapping=get("final_logit_softcapping") if arch == "gemma2" else None,
            sliding_window=get("sliding_window"),
            layer_types=layer_types,
            qk_norm=(arch == "gemma3"),
            pre_post_ffw_norm=arch in ("gemma2", "gemma3"),
            post_attn_residual_norm=arch in ("gemma2", "gemma3"),
            embed_scale=float(hidden) ** 0.5,
            tie_word_embeddings=True,
        )
    if mt == "opt":
        hidden = get("hidden_size")
        heads = get("num_attention_heads")
        return ModelConfig(
            arch="opt",
            vocab_size=get("vocab_size"),
            hidden_size=hidden,
            intermediate_size=get("ffn_dim"),
            num_layers=get("num_hidden_layers"),
            num_heads=heads,
            num_kv_heads=heads,
            head_dim=hidden // heads,
            max_position_embeddings=get("max_position_embeddings", 2048),
            hidden_act=get("activation_function", "relu"),
            norm_type="layernorm",
            rms_norm_eps=1e-5,  # nn.LayerNorm default (HF OPT hardcodes it)
            mlp_style="mlp",
            pos_embedding="learned",
            learned_pos_offset=2,
            attention_bias=get("enable_bias", True),
            attention_out_bias=get("enable_bias", True),
            mlp_bias=get("enable_bias", True),
            do_layer_norm_before=get("do_layer_norm_before", True),
            project_in_dim=(get("word_embed_proj_dim")
                            if get("word_embed_proj_dim") != hidden else None),
            tie_word_embeddings=get("tie_word_embeddings", True),
        )
    if mt == "bloom":
        hidden = get("hidden_size")
        heads = get("n_head") or get("num_attention_heads")
        return ModelConfig(
            arch="bloom",
            vocab_size=get("vocab_size"),
            hidden_size=hidden,
            intermediate_size=4 * hidden,
            num_layers=get("n_layer") or get("num_hidden_layers"),
            num_heads=heads,
            num_kv_heads=heads,
            head_dim=hidden // heads,
            hidden_act="gelu_tanh",
            norm_type="layernorm",
            rms_norm_eps=get("layer_norm_epsilon", 1e-5),
            mlp_style="mlp",
            pos_embedding="alibi",
            attention_bias=True,
            attention_out_bias=True,
            mlp_bias=True,
            fused_qkv=True,
            embedding_layernorm=True,
            tie_word_embeddings=True,
        )
    if mt == "phi":
        hidden = get("hidden_size")
        heads = get("num_attention_heads")
        return ModelConfig(
            arch="phi",
            vocab_size=get("vocab_size"),
            hidden_size=hidden,
            intermediate_size=get("intermediate_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=heads,
            num_kv_heads=get("num_key_value_heads") or heads,
            head_dim=hidden // heads,
            max_position_embeddings=get("max_position_embeddings", 2048),
            hidden_act=get("hidden_act", "gelu_new"),
            norm_type="layernorm",
            rms_norm_eps=get("layer_norm_eps", 1e-5),
            mlp_style="mlp",
            rope_theta=get("rope_theta", 10000.0),
            partial_rotary_factor=get("partial_rotary_factor", 0.5),
            attention_bias=True,
            attention_out_bias=True,
            mlp_bias=True,
            qk_layernorm=get("qk_layernorm", False),
            parallel_residual=True,
            tie_word_embeddings=get("tie_word_embeddings", False),
        )
    raise ValueError(f"Unsupported model_type {mt!r} (supported: {SUPPORTED_ARCHS})")
