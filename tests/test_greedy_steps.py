"""decode_greedy_steps (the scan serving fast path) vs per-step decode.

The fresh-block path keeps the main KV cache read-only inside the scan
(per-step K/V land in a FreshKV block, one merge after) and claims token
and merged-cache equivalence with the per-step carried-cache path — this
is its direct test (the bench was previously its only exerciser)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_compressor_tpu import algorithms as alg
from llm_compressor_tpu.engine import decode_greedy_steps, init_cache, prefill
from llm_compressor_tpu.engine.generate import decode_step, fresh_path_ok
from llm_compressor_tpu.models import fuse_model, init_params, stack_model, tiny_config
from llm_compressor_tpu.qformats import build_quant_config


def _setup(packed: bool, hidden=64, inter=128, vocab=256, arch="llama"):
    cfg = tiny_config(arch, hidden_size=hidden, intermediate_size=inter,
                      num_heads=4, num_kv_heads=2, head_dim=hidden // 4,
                      num_layers=2, vocab_size=vocab)
    params = init_params(cfg, jax.random.PRNGKey(0))
    qcfg = build_quant_config("int4-g[-2]-rw" if hidden < 128 else "int4-g[128]-rw",
                              "int8-g[-1]-rw", None, None)
    alg.rtn(params, cfg, qcfg)
    if packed:
        alg.pack_model(params, cfg, qcfg)
    params = stack_model(fuse_model(params, cfg, qcfg))
    return cfg, params, qcfg


@pytest.mark.parametrize("packed,arch", [(False, "llama"), (True, "llama"),
                                         (True, "gemma2")])
def test_fresh_path_matches_per_step_decode(packed, arch):
    # gemma2 pins the softcap ordering: the fresh path must cap raw scores
    # BEFORE the NEG_INF mask (cap-after-mask put masked lanes at -cap and
    # leaked attention mass — ADVICE r4 medium); its sliding_window=8 also
    # exercises the window mask in both paths.
    cfg, params, qcfg = _setup(packed, arch=arch)
    toks = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 6)).astype(np.int32)
    n = 4

    def prefilled():
        cache = init_cache(cfg.num_layers, 2, 16, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        logits, cache = prefill(params, jnp.asarray(toks), cache,
                                cfg=cfg, qcfg=qcfg)
        return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], cache

    tok, cache = prefilled()
    assert fresh_path_ok(params, cfg, cache, qcfg)
    fast_toks, fast_cache = decode_greedy_steps(params, tok, cache, n=n,
                                                cfg=cfg, qcfg=qcfg)

    tok, cache = prefilled()
    slow = []
    for _ in range(n):
        logits, cache = decode_step(params, tok, cache, cfg=cfg, qcfg=qcfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        slow.append(np.asarray(tok[:, 0]))

    np.testing.assert_array_equal(np.asarray(fast_toks), np.stack(slow, 1))
    # merged cache over the full written window (prefill prefix + the n
    # decoded positions): int8 CODES bitwise equal; scales equal to f32
    # ulps (the slimmed attention epilogue's reduction order differs
    # between the [main|fresh] two-part path and the carried single-window
    # path — generate.py fresh-block contract, _i8_softmax_requant)
    np.testing.assert_array_equal(np.asarray(fast_cache.lengths),
                                  np.asarray(cache.lengths))
    w = slice(0, toks.shape[1] + n)  # prefill prefix + decoded positions
    for name in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fast_cache, name))[..., w],
            np.asarray(getattr(cache, name))[..., w],
            err_msg=f"fresh-path merged cache.{name} codes not bitwise equal")
    for name in ("k_scale", "v_scale"):
        np.testing.assert_allclose(
            np.asarray(getattr(fast_cache, name))[..., w],
            np.asarray(getattr(cache, name))[..., w], rtol=1e-6,
            err_msg=f"fresh-path merged cache.{name} beyond f32-ulp")


@pytest.mark.parametrize("arch", ["llama", "gemma2"])
def test_append_kernel_path_matches_per_step_decode(arch):
    """Round-5 fused-append attention kernel (one Pallas call per layer
    computes [main | fresh+current] attention AND the fresh write, fresh
    threaded as layer-scan ys; DEFAULT-ON): same tokens as per-step
    carried decode, bitwise-equal merged cache codes (interpret mode on
    CPU). Uses max_len=128 — the kernel's S%128 gate — so the XLA-path
    tests above (max_len 16) keep covering the two-part fallback. gemma2
    pins softcap + sliding window through the kernel."""
    import importlib

    # the module name is shadowed by the function in engine/__init__
    gen = importlib.import_module("llm_compressor_tpu.engine.generate")
    cfg, params, qcfg = _setup(True, arch=arch)
    toks = np.random.default_rng(4).integers(
        0, cfg.vocab_size, (2, 6)).astype(np.int32)
    n = 4

    def prefilled():
        cache = init_cache(cfg.num_layers, 2, 128, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        logits, cache = prefill(params, jnp.asarray(toks), cache,
                                cfg=cfg, qcfg=qcfg)
        return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], cache

    tok, cache = prefilled()
    assert gen._append_path_ok(cfg, cache)
    fast_toks, fast_cache = decode_greedy_steps(params, tok, cache, n=n,
                                                cfg=cfg, qcfg=qcfg)

    tok, cache = prefilled()
    slow = []
    for _ in range(n):
        logits, cache = decode_step(params, tok, cache, cfg=cfg, qcfg=qcfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        slow.append(np.asarray(tok[:, 0]))
    np.testing.assert_array_equal(np.asarray(fast_toks), np.stack(slow, 1))
    w = slice(0, toks.shape[1] + n)
    for name in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fast_cache, name))[..., w],
            np.asarray(getattr(cache, name))[..., w],
            err_msg=f"append-kernel merged cache.{name} not bitwise equal")
    for name in ("k_scale", "v_scale"):
        np.testing.assert_allclose(
            np.asarray(getattr(fast_cache, name))[..., w],
            np.asarray(getattr(cache, name))[..., w], rtol=1e-6)


def test_append_kernel_quant_q_bitwise(monkeypatch):
    """In-kernel q row-quant (LLMC_ATTN_QUANT_Q) produces the same tokens
    as the XLA-prologue form — the kernel runs the identical
    _row_quant_i8 formula. n=5 gives a distinct jit key from the
    default-path test (the latch is read at trace time)."""
    import importlib

    gen = importlib.import_module("llm_compressor_tpu.engine.generate")
    cfg, params, qcfg = _setup(True)
    toks = np.random.default_rng(4).integers(
        0, cfg.vocab_size, (2, 6)).astype(np.int32)

    def run(n):
        cache = init_cache(cfg.num_layers, 2, 128, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        logits, cache = prefill(params, jnp.asarray(toks), cache,
                                cfg=cfg, qcfg=qcfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        t, _ = decode_greedy_steps(params, tok, cache, n=n, cfg=cfg,
                                   qcfg=qcfg)
        return np.asarray(t)

    monkeypatch.setattr(gen, "_APPEND_QUANT_Q", False)
    ref = run(3)[:, :3]
    monkeypatch.setattr(gen, "_APPEND_QUANT_Q", True)
    got = run(5)[:, :3]
    np.testing.assert_array_equal(got, ref)


def test_append_kernel_alias_mode_bitwise(monkeypatch):
    """Alias-accumulator mode (LLMC_ATTN_APPEND_ALIAS): the kernel writes
    its layer's fresh block straight into a carried (L, ...) buffer via
    write-only input_output_aliases — same tokens AND bitwise merged
    cache as per-step decode. n=6 gives a distinct jit key."""
    import importlib

    gen = importlib.import_module("llm_compressor_tpu.engine.generate")
    cfg, params, qcfg = _setup(True)
    toks = np.random.default_rng(4).integers(
        0, cfg.vocab_size, (2, 6)).astype(np.int32)
    n = 6

    def prefilled():
        cache = init_cache(cfg.num_layers, 2, 128, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        logits, cache = prefill(params, jnp.asarray(toks), cache,
                                cfg=cfg, qcfg=qcfg)
        return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], cache

    monkeypatch.setattr(gen, "_APPEND_ALIAS", True)
    tok, cache = prefilled()
    fast_toks, fast_cache = decode_greedy_steps(params, tok, cache, n=n,
                                                cfg=cfg, qcfg=qcfg)

    monkeypatch.setattr(gen, "_APPEND_ALIAS", False)
    tok, cache = prefilled()
    slow = []
    for _ in range(n):
        logits, cache = decode_step(params, tok, cache, cfg=cfg, qcfg=qcfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        slow.append(np.asarray(tok[:, 0]))
    np.testing.assert_array_equal(np.asarray(fast_toks), np.stack(slow, 1))
    w = slice(0, toks.shape[1] + n)
    for name in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fast_cache, name))[..., w],
            np.asarray(getattr(cache, name))[..., w])


def test_append_kernel_mpq_segments():
    """The append path under a 2-class MPQ stack (two layer-scan
    segments): per-segment ys concatenate into the full fresh update —
    same tokens as per-step decode."""
    from llm_compressor_tpu.qformats.config import register_4_to_8bit

    cfg = tiny_config("llama", hidden_size=64, intermediate_size=128,
                      num_heads=4, num_kv_heads=2, head_dim=16,
                      num_layers=4, vocab_size=256)
    params = init_params(cfg, jax.random.PRNGKey(5))
    qcfg = build_quant_config("int4-g[-2]-rw", "int8-g[-1]-rw", None, None)
    qcfg = register_4_to_8bit(
        qcfg, [f"layers.{i}.self_attn.q_proj.weight" for i in (0, 1)])
    # fake-quant weights: a PACKED stack cannot hold per-layer mixed
    # QTensor metadata (pre-existing MPQ serving limitation; the int8
    # attention-codes fresh path is what this test pins)
    alg.rtn(params, cfg, qcfg)
    params = stack_model(fuse_model(params, cfg, qcfg))
    toks = np.random.default_rng(6).integers(
        0, cfg.vocab_size, (2, 5)).astype(np.int32)
    n = 3

    def prefilled():
        cache = init_cache(cfg.num_layers, 2, 128, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        logits, cache = prefill(params, jnp.asarray(toks), cache,
                                cfg=cfg, qcfg=qcfg)
        return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], cache

    from llm_compressor_tpu.models.transformer import scan_segments
    assert len(scan_segments(cfg, qcfg)) == 2

    tok, cache = prefilled()
    fast_toks, _ = decode_greedy_steps(params, tok, cache, n=n,
                                       cfg=cfg, qcfg=qcfg)
    tok, cache = prefilled()
    slow = []
    for _ in range(n):
        logits, cache = decode_step(params, tok, cache, cfg=cfg, qcfg=qcfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        slow.append(np.asarray(tok[:, 0]))
    np.testing.assert_array_equal(np.asarray(fast_toks), np.stack(slow, 1))


def test_scan_unroll_is_bitwise_neutral():
    """The layer-scan unroll knob (measured an exact perf tie on the v5e —
    exp_scan_unroll.py — but kept as a tuning knob for other topologies)
    must not change a single emitted token."""
    cfg, params, qcfg = _setup(packed=True)
    toks = np.random.default_rng(2).integers(
        0, cfg.vocab_size, (2, 5)).astype(np.int32)

    outs = []
    for u in (1, 2, 3):
        cache = init_cache(cfg.num_layers, 2, 16, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        logits, cache = prefill(params, jnp.asarray(toks), cache,
                                cfg=cfg, qcfg=qcfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        t, _ = decode_greedy_steps(params, tok, cache, n=4, cfg=cfg,
                                   qcfg=qcfg, unroll=u)
        outs.append(np.asarray(t))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_carried_path_matches_per_step_decode():
    """Without the int8-act config the scan falls to the carried-cache
    body — same tokens as per-step decode."""
    cfg = tiny_config("llama", num_layers=2, dtype="float32")
    params = stack_model(init_params(cfg, jax.random.PRNGKey(1)))
    toks = np.random.default_rng(1).integers(
        0, cfg.vocab_size, (1, 5)).astype(np.int32)
    n = 3

    def prefilled():
        cache = init_cache(cfg.num_layers, 1, 12, cfg.num_kv_heads,
                           cfg.head_dim, dtype=jnp.float32)
        logits, cache = prefill(params, jnp.asarray(toks), cache, cfg=cfg)
        return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], cache

    tok, cache = prefilled()
    assert not fresh_path_ok(params, cfg, cache, None)
    fast_toks, _ = decode_greedy_steps(params, tok, cache, n=n, cfg=cfg)

    tok, cache = prefilled()
    slow = []
    for _ in range(n):
        logits, cache = decode_step(params, tok, cache, cfg=cfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        slow.append(np.asarray(tok[:, 0]))
    np.testing.assert_array_equal(np.asarray(fast_toks), np.stack(slow, 1))
