"""fuse_model: serving-time q|k|v and gate|up concatenation parity.

Fusion must be exact: shared input, row-wise group scales concatenate
losslessly along the output dim, per-token act quantizers see the same x.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_compressor_tpu.algorithms import pack_model, rtn
from llm_compressor_tpu.engine import decode_step, init_cache, prefill
from llm_compressor_tpu.models import (
    forward, fuse_model, init_params, stack_model, tiny_config)
from llm_compressor_tpu.qformats import build_quant_config


def _deepcopy_params(params):
    return jax.tree_util.tree_map(lambda x: x, copy.deepcopy(params))


@pytest.mark.parametrize("arch", ["llama", "qwen2", "opt"])
def test_fused_forward_matches_bf16(arch):
    cfg = tiny_config(arch)
    params = init_params(cfg, jax.random.PRNGKey(0))
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)
    ref = np.asarray(forward(params, cfg, jnp.asarray(toks)))

    fused = fuse_model(_deepcopy_params(params), cfg)
    lp0 = fused["layers"][0]
    assert "qkv_cat" in lp0["attn"] and "q" not in lp0["attn"]
    if cfg.mlp_style == "gated":
        assert "gateup" in lp0["mlp"]
    out = np.asarray(forward(fused, cfg, jnp.asarray(toks)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_fused_packed_decode_matches_unfused():
    cfg = tiny_config("llama")
    qcfg = build_quant_config("int4-g[32]-rw", "int8-g[-1]-rw", None, None)
    params = init_params(cfg, jax.random.PRNGKey(1))
    rtn(params, cfg, qcfg)
    pack_model(params, cfg, qcfg)

    toks = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 6)).astype(np.int32)

    def run(p):
        cache = init_cache(cfg.num_layers, 2, 8, cfg.num_kv_heads, cfg.head_dim,
                           dtype=jnp.float32)
        logits, cache = prefill(p, jnp.asarray(toks), cache, cfg=cfg, qcfg=qcfg)
        step, cache = decode_step(p, jnp.asarray(toks[:, :1]), cache, cfg=cfg, qcfg=qcfg)
        return np.asarray(logits), np.asarray(step)

    unfused = run(stack_model(_deepcopy_params(params)))
    fused = run(stack_model(fuse_model(_deepcopy_params(params), cfg, qcfg)))
    np.testing.assert_allclose(fused[0], unfused[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(fused[1], unfused[1], rtol=1e-4, atol=1e-4)


def test_fusion_skipped_on_mixed_overrides():
    """MPQ override on one projection must block fusion (different ops)."""
    from llm_compressor_tpu.qformats.config import register_4_to_8bit

    cfg = tiny_config("llama")
    qcfg = build_quant_config("int4-g[32]-rw", "int8-g[-1]-rw", None, None)
    qcfg = register_4_to_8bit(qcfg, ["layers.0.self_attn.q_proj.weight"])
    params = init_params(cfg, jax.random.PRNGKey(2))
    fused = fuse_model(params, cfg, qcfg)
    assert "qkv_cat" not in fused["layers"][0]["attn"]
    # gate/up untouched by the override -> still fusible
    assert "gateup" in fused["layers"][0]["mlp"]
