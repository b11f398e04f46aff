"""Engine tests: KV-cache decode parity vs full forward, quantized KV,
greedy generation, int8 cache accuracy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_compressor_tpu.engine import decode_step, generate, init_cache, prefill
from llm_compressor_tpu.models import forward, init_params, tiny_config


@pytest.mark.parametrize("arch", ["llama", "gemma2", "opt", "bloom", "phi"])
def test_cached_decode_matches_full_forward(arch):
    cfg = tiny_config(arch)
    params = init_params(cfg, jax.random.PRNGKey(0))
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 12)).astype(np.int32)

    full_logits = np.asarray(forward(params, cfg, jnp.asarray(toks)))

    cache = init_cache(cfg.num_layers, 1, 12, cfg.num_kv_heads, cfg.head_dim,
                       dtype=jnp.float32)
    pre_logits, cache = prefill(params, jnp.asarray(toks[:, :8]), cache, cfg=cfg)
    np.testing.assert_allclose(np.asarray(pre_logits), full_logits[:, 7], rtol=2e-3, atol=2e-3)

    for t in range(8, 12):
        logits, cache = decode_step(params, jnp.asarray(toks[:, t : t + 1]), cache, cfg=cfg)
        np.testing.assert_allclose(np.asarray(logits), full_logits[:, t],
                                   rtol=5e-3, atol=5e-3)


def test_quantized_kv_close():
    cfg = tiny_config("llama")
    params = init_params(cfg, jax.random.PRNGKey(1))
    toks = np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 10)).astype(np.int32)

    def run(quantized):
        cache = init_cache(cfg.num_layers, 1, 10, cfg.num_kv_heads, cfg.head_dim,
                           dtype=jnp.float32, quantized=quantized)
        logits, cache = prefill(params, jnp.asarray(toks[:, :9]), cache, cfg=cfg)
        logits, _ = decode_step(params, jnp.asarray(toks[:, 9:10]), cache, cfg=cfg)
        return np.asarray(logits)

    fp = run(False)
    q = run(True)
    rel = np.linalg.norm(q - fp) / np.linalg.norm(fp)
    assert rel < 0.05, rel
    assert not np.allclose(q, fp)  # quantization actually happened


def test_greedy_generation_deterministic():
    cfg = tiny_config("llama")
    params = init_params(cfg, jax.random.PRNGKey(2))
    prompt = np.random.default_rng(2).integers(0, cfg.vocab_size, (1, 5)).astype(np.int32)
    out1 = generate(params, cfg, prompt, max_new_tokens=6)
    out2 = generate(params, cfg, prompt, max_new_tokens=6)
    assert out1.shape[1] <= 11
    assert np.array_equal(out1, out2)
    assert np.array_equal(out1[:, :5], prompt)


def test_topk_sampling_runs():
    cfg = tiny_config("llama")
    params = init_params(cfg, jax.random.PRNGKey(3))
    prompt = np.random.default_rng(3).integers(0, cfg.vocab_size, (1, 4)).astype(np.int32)
    out = generate(params, cfg, prompt, max_new_tokens=4, temperature=0.8, top_k=10)
    assert out.shape[1] <= 8


def test_merge_fresh_uniform_matches_scatter():
    """merge_fresh's uniform-length DUS fast path (round 5) writes the
    same cache as the general scatter branch; ragged lengths take the
    scatter branch and land per-slot."""
    import jax
    import jax.numpy as jnp

    from llm_compressor_tpu.engine.kvcache import (
        init_cache,
        init_fresh,
        merge_fresh,
    )

    L, B, KV, D, S, n = 2, 4, 2, 8, 64, 5
    rng = np.random.default_rng(0)
    fresh = init_fresh(L, B, n, KV, D, quantized=True)
    fresh = fresh.replace(
        k=jnp.asarray(rng.integers(-127, 128, fresh.k.shape), jnp.int8),
        v=jnp.asarray(rng.integers(-127, 128, fresh.v.shape), jnp.int8),
        k_scale=jnp.asarray(rng.uniform(.01, .02, fresh.k_scale.shape),
                            jnp.float32),
        v_scale=jnp.asarray(rng.uniform(.01, .02, fresh.v_scale.shape),
                            jnp.float32))

    def merged(len0):
        cache = init_cache(L, B, S, KV, D, quantized=True)
        return merge_fresh(cache, fresh, jnp.asarray(len0, jnp.int32), n)

    # uniform: both branches must write identical values — compare the
    # DUS fast path (taken) against a hand-built scatter reference
    uni = merged([7, 7, 7, 7])
    for b in range(B):
        np.testing.assert_array_equal(
            np.asarray(uni.k[:, b, :, :, 7:7 + n]),
            np.asarray(jnp.swapaxes(fresh.k[:, b], 2, 3)))
    np.testing.assert_array_equal(np.asarray(uni.lengths), [12] * B)

    # ragged: scatter branch, per-slot offsets
    rag = merged([3, 9, 0, 6])
    for b, l0 in enumerate([3, 9, 0, 6]):
        np.testing.assert_array_equal(
            np.asarray(rag.k[:, b, :, :, l0:l0 + n]),
            np.asarray(jnp.swapaxes(fresh.k[:, b], 2, 3)))
        np.testing.assert_array_equal(
            np.asarray(rag.k_scale[:, b, :, :, l0:l0 + n]),
            np.asarray(fresh.k_scale[:, b]))
