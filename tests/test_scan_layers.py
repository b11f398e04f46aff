"""Scan-over-layers (stacked params) must match the unrolled forward and
decode paths exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_compressor_tpu.engine import decode_step, init_cache, prefill
from llm_compressor_tpu.models import forward, init_params, tiny_config
from llm_compressor_tpu.models.transformer import (
    quant_uniform,
    stack_model,
    uniform_layers,
)
from llm_compressor_tpu.qformats import build_quant_config


def test_uniformity_detection():
    assert uniform_layers(tiny_config("llama", num_layers=4), None)
    assert not uniform_layers(tiny_config("gemma2"), None)
    assert not uniform_layers(tiny_config("gemma3"), None)
    # ... but sliding-window archs still SCAN: only per-layer quantizer
    # differences block the scan path (window/rope ride as scan data)
    assert quant_uniform(tiny_config("gemma2"), None)
    assert quant_uniform(tiny_config("gemma3"), None)


@pytest.mark.parametrize("arch", ["gemma2", "gemma3", "qwen3"])
def test_stacked_sliding_window_forward_matches(arch):
    """Non-uniform stacks (sliding window + local rope theta) run as ONE
    lax.scan with per-layer window/rope scan data — must match the unrolled
    forward exactly. T > sliding_window so the window genuinely masks."""
    cfg = tiny_config(arch, num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12)))
    ref = np.asarray(forward(params, cfg, toks))
    out = np.asarray(forward(stack_model(params), cfg, toks))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("arch", ["gemma2", "gemma3"])
def test_stacked_sliding_window_decode_matches(arch):
    cfg = tiny_config(arch, num_layers=4, dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(2))
    toks = np.random.default_rng(2).integers(0, cfg.vocab_size, (1, 12)).astype(np.int32)

    def run(p):
        cache = init_cache(cfg.num_layers, 1, 12, cfg.num_kv_heads, cfg.head_dim,
                           dtype=jnp.float32)
        logits, cache = prefill(p, jnp.asarray(toks[:, :10]), cache, cfg=cfg)
        out = [np.asarray(logits)]
        for t in range(10, 12):
            logits, cache = decode_step(p, jnp.asarray(toks[:, t:t+1]), cache, cfg=cfg)
            out.append(np.asarray(logits))
        return np.stack(out)

    ref = run(params)
    out = run(stack_model(params))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("arch", ["llama", "opt", "bloom", "phi"])
def test_stacked_forward_matches(arch):
    cfg = tiny_config(arch, num_layers=3)
    params = init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 10)))
    ref = np.asarray(forward(params, cfg, toks))
    sp = stack_model(params)
    out = np.asarray(forward(sp, cfg, toks))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_stacked_quantized_forward_matches():
    from llm_compressor_tpu import algorithms as alg

    cfg = tiny_config("llama", hidden_size=128, intermediate_size=256,
                      num_heads=4, num_kv_heads=4, head_dim=32, num_layers=3)
    params = init_params(cfg, jax.random.PRNGKey(1))
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None, None)
    alg.rtn(params, cfg, qcfg)
    alg.pack_model(params, cfg, qcfg)
    toks = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 8)))
    ref = np.asarray(forward(params, cfg, toks, qcfg=qcfg))
    sp = stack_model(params)
    out = np.asarray(forward(sp, cfg, toks, qcfg=qcfg))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_scan_segments_plan():
    """MPQ overrides split the stack into maximal equal-LayerOps runs."""
    from llm_compressor_tpu.models.transformer import scan_segments
    from llm_compressor_tpu.qformats.config import register_4_to_8bit

    cfg = tiny_config("llama", num_layers=4)
    qcfg = build_quant_config("int4-g[-1]-rw", "int8-g[-1]-rw", None, None)
    segs = scan_segments(cfg, qcfg)
    assert len(segs) == 1 and segs[0][:2] == (0, 4)

    q2 = register_4_to_8bit(
        qcfg, [f"layers.{i}.self_attn.q_proj.weight" for i in (0, 1)])
    segs = scan_segments(cfg, q2)
    assert [(s0, s1) for s0, s1, _ in segs] == [(0, 2), (2, 4)]
    assert segs[0][2] != segs[1][2]


def test_mpq_two_class_decode_two_scans(monkeypatch):
    """A 2-class MPQ stack decodes via 2 lax.scans (one traced layer body
    per LayerOps run, not O(L)) and matches the unstacked per-layer path
    (VERDICT r2 item 9)."""
    import importlib

    gen = importlib.import_module("llm_compressor_tpu.engine.generate")
    from llm_compressor_tpu.qformats.config import register_4_to_8bit

    cfg = tiny_config("llama", num_layers=4, dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(3))
    qcfg = build_quant_config("int4-g[-1]-rw", "int8-g[-1]-rw", None, None)
    qcfg = register_4_to_8bit(
        qcfg, [f"layers.{i}.self_attn.q_proj.weight" for i in (0, 1)])

    toks = np.random.default_rng(3).integers(
        0, cfg.vocab_size, (1, 8)).astype(np.int32)

    def run(p):
        cache = init_cache(cfg.num_layers, 1, 8, cfg.num_kv_heads,
                           cfg.head_dim, dtype=jnp.float32)
        logits, cache = prefill(p, jnp.asarray(toks[:, :6]), cache,
                                cfg=cfg, qcfg=qcfg)
        out = [np.asarray(logits)]
        for t in range(6, 8):
            logits, cache = decode_step(p, jnp.asarray(toks[:, t:t + 1]),
                                        cache, cfg=cfg, qcfg=qcfg)
            out.append(np.asarray(logits))
        return np.stack(out)

    ref = run(params)
    sp = stack_model(params)
    out = run(sp)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    # compile-count: the decode trace visits the layer body once per RUN
    calls = []
    orig = gen._cached_layer
    monkeypatch.setattr(
        gen, "_cached_layer",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    cache = init_cache(cfg.num_layers, 1, 8, cfg.num_kv_heads,
                       cfg.head_dim, dtype=jnp.float32)
    jax.make_jaxpr(
        lambda p, tk, cc: gen._forward_cached(p, cfg, tk, cc, None, qcfg)
    )(sp, jnp.asarray(toks[:, :1]), cache)
    assert len(calls) == 2


def test_stacked_decode_matches():
    cfg = tiny_config("llama", num_layers=3, dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(2))
    toks = np.random.default_rng(2).integers(0, cfg.vocab_size, (1, 10)).astype(np.int32)

    def run(p):
        cache = init_cache(cfg.num_layers, 1, 10, cfg.num_kv_heads, cfg.head_dim,
                           dtype=jnp.float32)
        logits, cache = prefill(p, jnp.asarray(toks[:, :8]), cache, cfg=cfg)
        out = [np.asarray(logits)]
        for t in range(8, 10):
            logits, cache = decode_step(p, jnp.asarray(toks[:, t:t+1]), cache, cfg=cfg)
            out.append(np.asarray(logits))
        return np.stack(out)

    ref = run(params)
    out = run(stack_model(params))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
