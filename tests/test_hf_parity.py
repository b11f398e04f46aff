"""Logit parity vs HuggingFace transformers (torch CPU) on tiny random models.

For every supported architecture: build a tiny HF config, randomly initialize
the HF model, convert its state dict into our params pytree, and compare
full-sequence logits. This validates the shared transformer core against the
exact reference semantics (the reference wraps these same HF models —
SURVEY.md §2.5) without downloading any checkpoint.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from llm_compressor_tpu.models import (  # noqa: E402
    forward,
    from_hf_config,
    load_params_from_state_dict,
)

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, max_position_embeddings=64,
)


def _hf_tiny(arch):
    t = transformers
    if arch == "llama":
        return t.LlamaConfig(**TINY, num_key_value_heads=2, rope_theta=10000.0,
                             rope_scaling={"rope_type": "llama3", "factor": 8.0,
                                           "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                                           "original_max_position_embeddings": 32},
                             tie_word_embeddings=False, attn_implementation="eager")
    if arch == "qwen2":
        return t.Qwen2Config(**TINY, num_key_value_heads=2, attn_implementation="eager")
    if arch == "qwen3":
        return t.Qwen3Config(**TINY, num_key_value_heads=2, head_dim=16,
                             attn_implementation="eager")
    if arch == "gemma":
        return t.GemmaConfig(**TINY, num_key_value_heads=4, head_dim=16,
                             attn_implementation="eager")
    if arch == "gemma2":
        return t.Gemma2Config(**TINY, num_key_value_heads=2, head_dim=16,
                              query_pre_attn_scalar=16, sliding_window=8,
                              attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
                              attn_implementation="eager")
    if arch == "gemma3":
        return t.Gemma3TextConfig(**TINY, num_key_value_heads=2, head_dim=16,
                                  query_pre_attn_scalar=16, sliding_window=8,
                                  rope_theta=1000000.0, rope_local_base_freq=10000.0,
                                  rope_scaling={"rope_type": "linear", "factor": 8.0},
                                  attn_implementation="eager")
    if arch == "opt":
        return t.OPTConfig(vocab_size=256, hidden_size=64, ffn_dim=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           max_position_embeddings=64, do_layer_norm_before=True,
                           attn_implementation="eager")
    if arch == "opt350m":
        return t.OPTConfig(vocab_size=256, hidden_size=64, ffn_dim=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           max_position_embeddings=64, do_layer_norm_before=False,
                           word_embed_proj_dim=32, attn_implementation="eager")
    if arch == "bloom":
        return t.BloomConfig(vocab_size=256, hidden_size=64, n_layer=2, n_head=4,
                             attn_implementation="eager")
    if arch == "phi":
        return t.PhiConfig(**TINY, num_key_value_heads=4, partial_rotary_factor=0.5,
                           attn_implementation="eager")
    raise ValueError(arch)


ARCHS = ["llama", "qwen2", "qwen3", "gemma", "gemma2", "gemma3", "opt", "opt350m",
         "bloom", "phi"]


@pytest.mark.parametrize("arch", ARCHS)
def test_logit_parity(arch):
    hf_cfg = _hf_tiny(arch)
    torch.manual_seed(0)
    model = transformers.AutoModelForCausalLM.from_config(hf_cfg)
    model = model.eval().to(torch.float32)

    tokens = np.random.default_rng(0).integers(0, 256, (2, 16))
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()

    cfg = from_hf_config(hf_cfg)
    assert cfg.dtype == "bfloat16"
    from dataclasses import replace
    cfg = replace(cfg, dtype="float32")
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = load_params_from_state_dict(cfg, sd)
    ours = np.asarray(forward(params, cfg, jnp.asarray(tokens)))

    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
