"""models — shared TPU transformer core + per-arch configs + HF loading.

Replaces the reference's nine per-architecture adapter files (SURVEY.md
§2.5) with one parameterized decoder and a config table.
"""

from .config import ModelConfig, RopeScaling, SUPPORTED_ARCHS, from_hf_config
from .params import (
    init_params,
    load_hf_checkpoint,
    load_params_from_state_dict,
    save_compressed,
)
from .transformer import (
    LayerOps,
    arch_slots,
    fuse_model,
    stack_model,
    uniform_layers,
    decoder_layer,
    embed,
    forward,
    forward_hidden,
    head,
    layer_ops,
    make_causal_mask,
    op_names,
    rope_for_layer,
)


def tiny_config(arch: str = "llama", **overrides) -> ModelConfig:
    """Small random-init config for tests/benchmarks (no checkpoint needed)."""
    base = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        dtype="float32",
    )
    if arch in ("llama", "qwen2", "qwen3"):
        cfg = dict(base, arch=arch)
        if arch == "qwen2":
            cfg["attention_bias"] = True
        if arch == "qwen3":
            cfg["qk_norm"] = True
    elif arch == "gemma":
        cfg = dict(base, arch=arch, num_kv_heads=4, hidden_act="gelu_pytorch_tanh",
                   norm_weight_plus_one=True, embed_scale=8.0, tie_word_embeddings=True)
    elif arch == "gemma2":
        cfg = dict(base, arch=arch, hidden_act="gelu_pytorch_tanh",
                   norm_weight_plus_one=True, embed_scale=8.0, tie_word_embeddings=True,
                   query_pre_attn_scalar=16.0, attn_logit_softcapping=50.0,
                   final_logit_softcapping=30.0, sliding_window=8,
                   pre_post_ffw_norm=True, post_attn_residual_norm=True)
    elif arch == "gemma3":
        cfg = dict(base, arch=arch, hidden_act="gelu_pytorch_tanh",
                   norm_weight_plus_one=True, embed_scale=8.0, tie_word_embeddings=True,
                   query_pre_attn_scalar=16.0, qk_norm=True, sliding_window=8,
                   rope_local_theta=10000.0, rope_theta=1000000.0,
                   pre_post_ffw_norm=True, post_attn_residual_norm=True)
    elif arch == "opt":
        cfg = dict(base, arch=arch, num_kv_heads=4, hidden_act="relu",
                   norm_type="layernorm", mlp_style="mlp", pos_embedding="learned",
                   learned_pos_offset=2, attention_bias=True, attention_out_bias=True,
                   mlp_bias=True, tie_word_embeddings=True)
    elif arch == "bloom":
        cfg = dict(base, arch=arch, num_kv_heads=4, intermediate_size=256,
                   hidden_act="gelu_tanh", norm_type="layernorm", mlp_style="mlp",
                   pos_embedding="alibi", attention_bias=True, attention_out_bias=True,
                   mlp_bias=True, fused_qkv=True, embedding_layernorm=True,
                   tie_word_embeddings=True)
    elif arch == "phi":
        cfg = dict(base, arch=arch, num_kv_heads=4, hidden_act="gelu_new",
                   norm_type="layernorm", mlp_style="mlp", partial_rotary_factor=0.5,
                   attention_bias=True, attention_out_bias=True, mlp_bias=True,
                   parallel_residual=True, tie_word_embeddings=False)
    else:
        raise ValueError(arch)
    cfg.update(overrides)
    if arch == "gemma3" and "layer_types" not in cfg:
        # gemma3's alternating local/global pattern, sized to num_layers
        cfg["layer_types"] = tuple(
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(cfg["num_layers"]))
    return ModelConfig(**cfg)


__all__ = [
    "ModelConfig", "RopeScaling", "SUPPORTED_ARCHS", "from_hf_config",
    "init_params", "load_hf_checkpoint", "load_params_from_state_dict",
    "forward", "forward_hidden", "embed", "head", "decoder_layer",
    "make_causal_mask", "op_names", "rope_for_layer", "tiny_config",
    "LayerOps", "layer_ops", "arch_slots", "fuse_model", "stack_model",
    "uniform_layers",
]
