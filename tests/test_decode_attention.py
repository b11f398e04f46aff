"""Fused int8-KV decode attention kernel (kernels/decode_attention.py):
numpy-reference parity in both modes, and end-to-end decode equivalence
against the XLA dequantize path (kernel force-disabled) incl. sliding
window + softcap archs. CPU runs the kernel in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_compressor_tpu.engine import decode_step, init_cache, prefill
from llm_compressor_tpu.kernels import decode_attention as da
from llm_compressor_tpu.models import init_params, tiny_config
from llm_compressor_tpu.models.transformer import stack_model
from llm_compressor_tpu.qformats import build_quant_config


def _rand_cache(rng, L, B, KV, D, S):
    kc = rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8)
    vc = rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8)
    ks = rng.uniform(0.01, 0.05, (L, B, KV, 1, S)).astype(np.float32)
    vs = rng.uniform(0.01, 0.05, (L, B, KV, 1, S)).astype(np.float32)
    return kc, vc, ks, vs


def _ref(q, kc, vc, ks, vs, layer, lengths, window, scale, softcap):
    """Numpy reference: dequantize, score, mask, softmax, combine."""
    B, KV, r, D = q.shape
    S = kc.shape[-1]
    K = kc[layer].astype(np.float64) * ks[layer]
    V = vc[layer].astype(np.float64) * vs[layer]
    out = np.zeros((B, KV, r, D))
    for b in range(B):
        for k in range(KV):
            s = (q[b, k].astype(np.float64) @ K[b, k]) * scale  # (r, S)
            if softcap is not None:
                s = softcap * np.tanh(s / softcap)
            ids = np.arange(S)
            keep = ids <= lengths[b]
            if window > 0:
                keep &= ids > lengths[b] - window
            s = np.where(keep, s, -1e9)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, k] = p @ V[b, k].T
    return out


@pytest.mark.parametrize("window", [0, 40])
def test_kernel_matches_numpy_float_mode(rng, window):
    L, B, KV, r, D, S = 3, 2, 2, 2, 16, 128
    kc, vc, ks, vs = _rand_cache(rng, L, B, KV, D, S)
    q = rng.normal(size=(B, KV, r, D)).astype(np.float32)
    lengths = np.asarray([100, 37], np.int32)
    out = np.asarray(da.decode_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(ks),
        jnp.asarray(vs), 1, jnp.asarray(lengths), window,
        scale=0.25, softcap=None, quant_acts=False, out_dtype=jnp.float32))
    ref = _ref(q, kc, vc, ks, vs, 1, lengths, window, 0.25, None)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_kernel_softcap(rng):
    L, B, KV, r, D, S = 2, 1, 2, 2, 16, 128
    kc, vc, ks, vs = _rand_cache(rng, L, B, KV, D, S)
    q = (5 * rng.normal(size=(B, KV, r, D))).astype(np.float32)
    lengths = np.asarray([127], np.int32)
    out = np.asarray(da.decode_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(ks),
        jnp.asarray(vs), 0, jnp.asarray(lengths), 0,
        scale=1.0, softcap=50.0, quant_acts=False, out_dtype=jnp.float32))
    ref = _ref(q, kc, vc, ks, vs, 0, lengths, 0, 1.0, 50.0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_kernel_int8_mode_close_to_float(rng):
    """quant_acts=True re-quantizes q and the scaled prob rows to int8 —
    bounded error vs the exact float mode."""
    L, B, KV, r, D, S = 2, 2, 2, 2, 16, 128
    kc, vc, ks, vs = _rand_cache(rng, L, B, KV, D, S)
    q = rng.normal(size=(B, KV, r, D)).astype(np.float32)
    lengths = np.asarray([90, 128 - 1], np.int32)
    args = (jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(ks), jnp.asarray(vs), 0, jnp.asarray(lengths), 0)
    f = np.asarray(da.decode_attention(*args, scale=0.25, quant_acts=False,
                                       out_dtype=jnp.float32))
    i = np.asarray(da.decode_attention(*args, scale=0.25, quant_acts=True,
                                       out_dtype=jnp.float32))
    err = np.abs(f - i).max() / (np.abs(f).max() + 1e-9)
    assert err < 0.05, err


def _e2e(arch, qspec, quant_acts_expected):
    cfg = tiny_config(arch, num_layers=3, dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    qcfg = build_quant_config(*qspec) if qspec else None
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12)).astype(np.int32)

    if qcfg is not None:
        ops0 = __import__("llm_compressor_tpu.models.transformer",
                          fromlist=["layer_ops"]).layer_ops(cfg, qcfg, 0)
        assert da.acts_mode(ops0.qk, ops0.sv) is quant_acts_expected

    def run(p, use_kernel):
        # S=128 (kernel-eligible); int8 cache. fused_attn=True opts into
        # the Pallas kernel (the default decode path is XLA int8-codes).
        cache = init_cache(cfg.num_layers, 2, 128, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        logits, cache = prefill(p, jnp.asarray(toks[:, :10]), cache,
                                cfg=cfg, qcfg=qcfg)
        outs = [np.asarray(logits)]
        for t in range(10, 12):
            logits, cache = decode_step(p, jnp.asarray(toks[:, t:t+1]),
                                        cache, cfg=cfg, qcfg=qcfg,
                                        fused_attn=use_kernel)
            outs.append(np.asarray(logits))
        return np.stack(outs)

    ref = run(params, use_kernel=False)
    out = run(params, use_kernel=True)
    return ref, out


@pytest.mark.parametrize("arch", ["llama", "gemma2", "phi", "opt"])
def test_decode_kernel_matches_xla_float(arch):
    """Float mode must match the XLA dequant path (same stored codes; the
    kernel skips the bf16 window round-trip but tiny configs run f32)."""
    ref, out = _e2e(arch, None, False)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_decode_kernel_int8_mode_close():
    """int8 act mode approximates the XLA double-quant path (the kernel
    folds v_scale into the prob rows before quantizing — same bit budget,
    different grouping) — logits stay close."""
    ref, out = _e2e("llama", ("int4-g[32]-rw", "int8-g[-1]-rw", None, None), True)
    assert np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-9) < 0.08


def test_stacked_scan_decode_uses_kernel():
    """The kernel must also work under the lax.scan serving form (layer
    index + window are traced scan data)."""
    cfg = tiny_config("gemma2", num_layers=4, dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(1))
    toks = np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 12)).astype(np.int32)

    def run(p):
        cache = init_cache(cfg.num_layers, 1, 128, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        logits, cache = prefill(p, jnp.asarray(toks[:, :10]), cache, cfg=cfg)
        out = [np.asarray(logits)]
        for t in range(10, 12):
            logits, cache = decode_step(p, jnp.asarray(toks[:, t:t+1]), cache,
                                        cfg=cfg, fused_attn=True)
            out.append(np.asarray(logits))
        return np.stack(out)

    ref = run(params)
    out = run(stack_model(params))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
