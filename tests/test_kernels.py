"""Pallas kernel numerics vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_compressor_tpu.kernels import dequant_matmul, dequant_matmul_xla
from llm_compressor_tpu.qformats import ElemFormat, Quantizer, quantize_pack


@pytest.mark.parametrize(
    "qtype,fmt,gs,zp",
    [
        ("int", ElemFormat.int4, 128, False),
        ("int", ElemFormat.int4, 128, True),
        ("int", ElemFormat.int8, 128, False),
        ("fp", ElemFormat.fp8_e4m3, 128, False),
    ],
)
def test_dequant_matmul_matches_xla(rng, qtype, fmt, gs, zp):
    N, C, M = 256, 256, 8
    W = rng.normal(0, 0.1, size=(N, C)).astype(np.float32)
    if zp:
        W = np.abs(W)
    x = rng.normal(size=(M, C)).astype(np.float32)
    q = Quantizer(qtype=qtype, fmt=fmt, group_size=gs, zero_point=zp)
    qt = quantize_pack(q, jnp.asarray(W))
    xb = jnp.asarray(x, dtype=jnp.bfloat16)

    ref = np.asarray(dequant_matmul_xla(xb, qt)).astype(np.float32)
    out = np.asarray(dequant_matmul(xb, qt)).astype(np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2 * np.abs(ref).max())


def test_dequant_matmul_3d_and_bias(rng):
    N, C = 256, 256
    W = rng.normal(0, 0.1, size=(N, C)).astype(np.float32)
    x = rng.normal(size=(2, 4, C)).astype(np.float32)
    b = rng.normal(size=(N,)).astype(np.float32)
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=128)
    qt = quantize_pack(q, jnp.asarray(W))
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    ref = np.asarray(dequant_matmul_xla(xb, qt, jnp.asarray(b)))
    out = np.asarray(dequant_matmul(xb, qt, jnp.asarray(b)))
    assert out.shape == (2, 4, N)
    np.testing.assert_allclose(out.astype(np.float32), ref.astype(np.float32),
                               rtol=2e-2, atol=0.1)


def test_unsupported_falls_back(rng):
    # group 32 < 128 -> XLA fallback must be used and still be correct
    N, C = 64, 64
    W = rng.normal(size=(N, C)).astype(np.float32)
    x = rng.normal(size=(4, C)).astype(np.float32)
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=32)
    qt = quantize_pack(q, jnp.asarray(W))
    out = dequant_matmul(jnp.asarray(x), qt)
    ref = dequant_matmul_xla(jnp.asarray(x), qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
