"""Model core tests: forward shape/finite checks for all 9 architectures and
quantized-forward smoke tests (tiny random-init configs, XLA CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_compressor_tpu.models import SUPPORTED_ARCHS, forward, init_params, tiny_config
from llm_compressor_tpu.qformats import build_quant_config


@pytest.mark.parametrize("arch", SUPPORTED_ARCHS)
def test_forward_shapes(arch):
    cfg = tiny_config(arch)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12)))
    logits = forward(params, cfg, tokens)
    assert logits.shape == (2, 12, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_causal_dependence():
    # Changing a future token must not affect past logits.
    cfg = tiny_config("llama")
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, (1, 10))
    toks2 = toks.copy()
    toks2[0, -1] = (toks2[0, -1] + 1) % cfg.vocab_size
    l1 = forward(params, cfg, jnp.asarray(toks))
    l2 = forward(params, cfg, jnp.asarray(toks2))
    assert np.allclose(np.asarray(l1[0, :-1]), np.asarray(l2[0, :-1]), atol=1e-5)
    assert not np.allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]), atol=1e-5)


def test_quantized_forward_close_to_fp():
    cfg = tiny_config("llama")
    params = init_params(cfg, jax.random.PRNGKey(2))
    tokens = jnp.asarray(np.random.default_rng(2).integers(0, cfg.vocab_size, (1, 16)))
    ref = forward(params, cfg, tokens)
    qcfg = build_quant_config(None, "int8-g[-1]-rw", None, None)
    quant = forward(params, cfg, tokens, qcfg=qcfg)
    rel = float(jnp.linalg.norm(quant - ref) / jnp.linalg.norm(ref))
    assert rel < 0.1, rel
    assert not np.allclose(np.asarray(quant), np.asarray(ref))  # quant actually ran


def test_sliding_window_masks_differ():
    cfg = tiny_config("gemma2")
    params = init_params(cfg, jax.random.PRNGKey(3))
    tokens = jnp.asarray(np.random.default_rng(3).integers(0, cfg.vocab_size, (1, 32)))
    logits = forward(params, cfg, tokens)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # softcap bounds final logits
    assert float(jnp.max(jnp.abs(logits))) <= cfg.final_logit_softcapping + 1e-3
