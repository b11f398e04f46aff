"""W4A8 fused kernel vs the simulated (fake-quant) reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_compressor_tpu.kernels.w4a8_matmul import (
    quantize_acts_per_token,
    supported,
    w4a8_matmul,
)
from llm_compressor_tpu.qformats import (
    ElemFormat,
    Quantizer,
    dequantize,
    quantize_dequant,
    quantize_pack,
)


def _simulated(x, qt):
    """The fake-quant path the reference uses: qdq acts, qdq weights, matmul."""
    a = Quantizer(qtype="int", fmt=ElemFormat.int8, group_size=-1)
    xq = quantize_dequant(a, x.astype(jnp.float32))
    w = dequantize(qt).astype(jnp.float32)
    return xq @ w.T


@pytest.mark.parametrize("fmt,gs", [(ElemFormat.int4, 128), (ElemFormat.int8, 128),
                                    (ElemFormat.int4, 256)])
def test_matches_simulated_path(rng, fmt, gs):
    N, C, M = 256, 512, 8
    W = rng.normal(0, 0.1, size=(N, C)).astype(np.float32)
    x = rng.normal(size=(M, C)).astype(np.float32)
    q = Quantizer(qtype="int", fmt=fmt, group_size=gs)
    qt = quantize_pack(q, jnp.asarray(W))
    assert supported(qt)

    ref = np.asarray(_simulated(jnp.asarray(x), qt))
    out = np.asarray(w4a8_matmul(jnp.asarray(x), qt)).astype(np.float32)
    # integer math is exact; differences only from scale multiply order
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4 * np.abs(ref).max())


def test_act_quantization_semantics(rng):
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    q, s = quantize_acts_per_token(x)
    a = Quantizer(qtype="int", fmt=ElemFormat.int8, group_size=-1)
    ref = np.asarray(quantize_dequant(a, x))
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(s), ref,
                               rtol=1e-5, atol=1e-6)


def test_unsupported_configs(rng):
    W = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    zp = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=128, zero_point=True)
    assert not supported(quantize_pack(zp, jnp.abs(W)))
    small_g = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=32)
    assert not supported(quantize_pack(small_g, W))


def test_model_forward_uses_fused_path(rng):
    """End-to-end: packed model with int8-per-token act config must produce
    outputs close to the simulated quantized forward."""
    import jax

    from llm_compressor_tpu import algorithms as alg
    from llm_compressor_tpu.models import forward, init_params, tiny_config
    from llm_compressor_tpu.qformats import build_quant_config

    cfg = tiny_config("llama", hidden_size=128, intermediate_size=256,
                      num_heads=4, num_kv_heads=4, head_dim=32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None, None)
    alg.rtn(params, cfg, qcfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)))
    ref = np.asarray(forward(params, cfg, toks, qcfg=qcfg))
    alg.pack_model(params, cfg, qcfg)
    out = np.asarray(forward(params, cfg, toks, qcfg=qcfg))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_gptq_scale_book_packing_exact(rng):
    """With the calibration scale book, packing GPTQ output is lossless:
    dequantize(pack(Q, scales)) == Q exactly."""
    import jax

    from llm_compressor_tpu import algorithms as alg
    from llm_compressor_tpu.capture import capture_layer0
    from llm_compressor_tpu.models import init_params, tiny_config
    from llm_compressor_tpu.qformats import build_quant_config
    from llm_compressor_tpu.utils.dataset import synthetic_tokens

    cfg = tiny_config("llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    qcfg = build_quant_config("int4-g[32]-rw", None, None, None)
    ctx = capture_layer0(params, cfg, jnp.asarray(synthetic_tokens(4, 32, cfg.vocab_size)), chunk=2)
    book = {}
    alg.gptq(params, cfg, ctx, qcfg, scale_book=book)
    assert (0, "q") in book

    Q = params["layers"][0]["attn"]["q"]["weight"]
    s, z = book[(0, "q")]
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=32)
    qt = quantize_pack(q, Q, scales=s, zeros=z)
    np.testing.assert_allclose(np.asarray(dequantize(qt)), np.asarray(Q),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("fmt", [ElemFormat.int4, ElemFormat.int8])
def test_stacked_layer_kernel_bitwise(rng, fmt):
    """The stacked scalar-prefetch kernel (layer=i over (L, N, K[/2])
    codes) is BITWISE identical to the per-layer kernel — it is the same
    math reading the same bytes at a layer offset."""
    import jax
    import jax.numpy as jnp

    L, N, C, M = 3, 256, 512, 8
    q = Quantizer(qtype="int", fmt=fmt, group_size=128)
    qts = [quantize_pack(q, jnp.asarray(
        rng.normal(0, 0.1, size=(N, C)).astype(np.float32))) for _ in range(L)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)
    assert supported(stacked) and stacked.codes.ndim == 3
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    for i in range(L):
        ref = np.asarray(w4a8_matmul(x, qts[i]))
        out = np.asarray(w4a8_matmul(x, stacked, layer=jnp.int32(i)))
        np.testing.assert_array_equal(out, ref)


def test_head_act_routes_integer_kernel(rng):
    """head_act=int8-per-token routes the packed lm_head through the W4A8
    kernel; serving output matches the fake-quant simulation of the same
    config (quantized head input + quantized head weights)."""
    import jax
    import jax.numpy as jnp

    from llm_compressor_tpu import algorithms as alg
    from llm_compressor_tpu.models import forward, init_params, tiny_config
    from llm_compressor_tpu.qformats import build_quant_config

    cfg = tiny_config("llama", hidden_size=128, intermediate_size=256,
                      num_heads=4, num_kv_heads=4, head_dim=32, num_layers=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None,
                              "int8-g[128]-rw", head_act="int8-g[-1]-rw")
    alg.rtn(params, cfg, qcfg)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, 8)))
    sim = np.asarray(forward(params, cfg, toks, qcfg=qcfg))   # fake-quant
    alg.pack_model(params, cfg, qcfg)
    assert any(hasattr(params.get(k, {}).get("weight", None), "codes")
               for k in ("lm_head",)) or "lm_head" in params
    real = np.asarray(forward(params, cfg, toks, qcfg=qcfg))  # packed
    np.testing.assert_allclose(real, sim, rtol=2e-2,
                               atol=2e-2 * np.abs(sim).max())


def test_unpack_modes_agree(rng, monkeypatch):
    """The three int4 unpack strategies (i32 / hybrid / xor —
    kernels/w4a8_matmul._UNPACK, an on-chip A/B knob) compute the same
    matmul: int32 dot math is exact in all three; only f32 epilogue
    rounding differs (the hybrid/xor bias corrections are folded into
    separate f32 terms)."""
    import importlib

    # the kernels package re-exports the function under the module's name,
    # so a plain ``import a.b as wm`` resolves to the function
    wm = importlib.import_module("llm_compressor_tpu.kernels.w4a8_matmul")

    N, C, M, g = 256, 512, 8, 128
    W = rng.normal(0, 0.1, size=(N, C)).astype(np.float32)
    x = rng.normal(size=(M, C)).astype(np.float32)
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=g)
    qt = quantize_pack(q, jnp.asarray(W))
    x_i8, sx = quantize_acts_per_token(jnp.asarray(x))
    scales_t = qt.scales_t
    kw = dict(group=g, int4=True, tm=32, tn=256, tk=512)

    outs = {}
    for mode in ("i32", "hybrid", "xor"):
        monkeypatch.setattr(wm, "_UNPACK", mode)
        # __wrapped__ bypasses the jit cache (the mode is read at trace
        # time, so the cached executable would ignore the monkeypatch)
        outs[mode] = np.asarray(
            wm._call.__wrapped__(x_i8, qt.codes, scales_t,
                                 sx.astype(jnp.float32), **kw),
            np.float32)
    ref = outs["i32"]
    for mode in ("hybrid", "xor"):
        np.testing.assert_allclose(outs[mode], ref, rtol=1e-5,
                                   atol=1e-5 * np.abs(ref).max())


def test_fused_gateup_silu_matches_split(rng):
    """gateup_silu_matmul (fused gate|up + activation kernel) ==
    [stacked gateup kernel] -> bf16 -> silu(g)*u within a few bf16 ulps.
    The fused epilogue rounds each half through bf16 with the act scale
    exactly like the plain kernel, but the activation runs in f32 with a
    single final round (Mosaic can't lower bf16 transcendentals —
    BENCH_r04's on-chip crash), while the split path rounds per HLO op —
    so equality is ulp-class, not bitwise."""
    import jax

    from llm_compressor_tpu.kernels.w4a8_matmul import (
        gateup_silu_matmul,
        gateup_silu_ok,
        w4a8_matmul,
    )

    L, I, C, M, g = 2, 512, 256, 8, 128
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=g)
    qts = [quantize_pack(q, jnp.asarray(
        rng.normal(0, 0.1, size=(2 * I, C)).astype(np.float32)))
        for _ in range(L)]
    codes = jnp.stack([t.codes.reshape(2 * I, C // 2) for t in qts])
    scales = jnp.stack([t.scales.reshape(2 * I, C // g) for t in qts])
    st = jnp.stack([t.scales.reshape(2 * I, C // g).T for t in qts])
    stacked = qts[0].replace(codes=codes, scales=scales, scales_t=st)
    assert gateup_silu_ok(stacked, "silu")

    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                    jnp.bfloat16)
    for li in range(L):
        got = np.asarray(
            gateup_silu_matmul(x, stacked, "silu", jnp.int32(li)),
            np.float32)
        y = w4a8_matmul(x, stacked, layer=jnp.int32(li))   # (M, 2I) bf16
        ref = np.asarray(jax.nn.silu(y[:, :I]) * y[:, I:], np.float32)
        # bf16 has ~2^-8 relative precision; allow a few ulps of divergence
        # from the per-op-rounded split path.
        np.testing.assert_allclose(got, ref, rtol=2e-2,
                                   atol=2e-2 * np.abs(ref).max())


def test_pair_planes_layout(rng):
    """Round-5 pair-planes int4 layout: packing pairs adjacent groups into
    nibble planes (byte j of pair t = elems (2t*g+j, (2t+1)*g+j)); the
    kernel's pair path, the legacy group-halves path on converted codes,
    and the XLA dequantize all agree on identical values."""
    from llm_compressor_tpu.qformats.qtensor import to_group_halves

    N, C, g, M = 256, 512, 128, 8
    W = rng.normal(0, 0.1, size=(N, C)).astype(np.float32)
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=g)
    qt = quantize_pack(q, jnp.asarray(W))
    assert qt.pair_planes  # even group count -> pairs by default

    # byte semantics: lo nibble = even group, hi nibble = odd group
    codes = np.asarray(qt.codes)
    vals = np.asarray(dequantize(qt), np.float32)
    scales = np.asarray(qt.scales)
    t, j = 1, 5  # pair 1 (groups 2, 3), elem 5
    lo = int(codes[0, t * g + j] & 0x0F) - 8
    hi = int(codes[0, t * g + j] >> 4) - 8
    assert lo * scales[0, 2 * t] == pytest.approx(vals[0, 2 * t * g + j])
    assert hi * scales[0, 2 * t + 1] == pytest.approx(
        vals[0, (2 * t + 1) * g + j])

    leg = to_group_halves(qt)
    assert not leg.pair_planes
    np.testing.assert_array_equal(np.asarray(dequantize(leg)),
                                  np.asarray(dequantize(qt)))

    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    y_pair = np.asarray(w4a8_matmul(x, qt), np.float32)
    y_leg = np.asarray(w4a8_matmul(x, leg), np.float32)
    # same quantized matmul; pair path folds the lo bias into one epilogue
    # dot and the 16x hi factor into the scales (f32-exact) — ulp-class
    np.testing.assert_allclose(y_pair, y_leg, atol=2e-2, rtol=1e-2)


def test_pair_planes_odd_groups_fall_back(rng):
    """Odd group count cannot pair: packs group halves, kernel still runs."""
    N, C, g = 128, 384, 128  # G = 3
    W = rng.normal(0, 0.1, size=(N, C)).astype(np.float32)
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=g)
    qt = quantize_pack(q, jnp.asarray(W))
    assert not qt.pair_planes
    x = jnp.asarray(rng.normal(size=(4, C)).astype(np.float32))
    ref = np.asarray(_simulated(x, qt))
    out = np.asarray(w4a8_matmul(x, qt), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)


def test_pair_planes_dequant_matmul(rng):
    """The dequant kernel's pair path matches the XLA dequantize path."""
    from llm_compressor_tpu.kernels.dequant_matmul import (
        dequant_matmul, dequant_matmul_xla)

    N, C, g = 256, 512, 128
    W = rng.normal(0, 0.1, size=(N, C)).astype(np.float32)
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=g)
    qt = quantize_pack(q, jnp.asarray(W))
    assert qt.pair_planes
    x = jnp.asarray(rng.normal(size=(8, C)).astype(np.float32), jnp.bfloat16)
    got = np.asarray(dequant_matmul(x, qt), np.float32)
    ref = np.asarray(dequant_matmul_xla(x, qt), np.float32)
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=2e-2)
