"""Native host library (C++ int4 packer) vs the jnp QTensor path."""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_compressor_tpu.utils.native import have_native, quantize_pack_int4, unpack_int4
from llm_compressor_tpu.qformats import ElemFormat, Quantizer, quantize_pack


def test_native_available():
    assert have_native(), "native library failed to build/load"


def test_native_matches_jnp_packer(rng):
    W = rng.normal(size=(32, 256)).astype(np.float32)
    packed, scales = quantize_pack_int4(W, group=128)

    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=128)
    qt = quantize_pack(q, jnp.asarray(W))
    # QTensor keeps blocked layout (N, n_groups, g/2); groups are contiguous
    np.testing.assert_array_equal(packed, np.asarray(qt.codes).reshape(32, 128))
    np.testing.assert_allclose(scales, np.asarray(qt.scales).reshape(32, 2), rtol=1e-6)


def test_native_roundtrip(rng):
    W = rng.normal(size=(16, 128)).astype(np.float32)
    packed, scales = quantize_pack_int4(W, group=128)
    codes = unpack_int4(packed, group=128)
    recon = codes.reshape(16, 1, 128) * scales[..., None]
    err = np.abs(recon.reshape(16, 128) - W)
    # max error bounded by half a quantization step per group
    assert np.all(err <= scales.max(axis=1)[:, None] * 0.5 + 1e-6)


def test_native_pair_layout_matches_jnp(rng):
    """The native packer emits the same pair-planes bytes quantize_pack
    does (the default int4 layout since round 5), and both layouts
    round-trip through the native unpack."""
    import numpy as np
    from llm_compressor_tpu.qformats.qtensor import dequantize

    W = rng.normal(0, 0.1, size=(64, 512)).astype(np.float32)
    packed, scales = quantize_pack_int4(W, group=128)  # auto: pairs
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=128)
    qt = quantize_pack(q, jnp.asarray(W))
    assert qt.pair_planes
    np.testing.assert_array_equal(packed, np.asarray(qt.codes))
    np.testing.assert_allclose(scales, np.asarray(qt.scales), rtol=1e-6)

    codes = unpack_int4(packed, group=128)
    vals = np.asarray(dequantize(qt), np.float32)
    sc = np.repeat(np.asarray(qt.scales), 128, axis=1)
    np.testing.assert_allclose(codes * sc, vals, atol=1e-5)

    # explicit legacy layout still round-trips
    p2, s2 = quantize_pack_int4(W, group=128, pairs=False)
    c2 = unpack_int4(p2, group=128, pairs=False)
    np.testing.assert_allclose(c2 * sc, vals, atol=1e-5)
