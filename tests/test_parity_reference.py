"""Numerics parity vs the reference implementation (torch CPU oracle).

Imports the reference quantizers from /root/reference (read-only) and checks
our jnp quantizers produce bit-identical (within f32 round-off) results on
random data, across formats, group modes, symmetry, and the MSE clip search.

The reference modules use non-package imports (``from base import ...``), so
we put the quantizers directory itself on sys.path.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/llm_compressor/quantization/quantizers"
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax.numpy as jnp  # noqa: E402

from llm_compressor_tpu.qformats import ElemFormat, Quantizer, quantize_dequant  # noqa: E402


def _ref_quantize(kind, fmt, group_size, axes, zero_point, mse, x):
    from int_quant import INTQuantizer
    from fp_quant import FPQuantizer
    from mx_quant import MXQuantizer
    from nvfp_quant import NVFPQuantizer
    from formats import ElemFormat as RefFmt

    cls = {"int": INTQuantizer, "fp": FPQuantizer, "mx": MXQuantizer, "nvfp": NVFPQuantizer}[kind]
    quant = cls(format=getattr(RefFmt, fmt), group_size=group_size, axes=axes, zero_point=zero_point)
    quant.mse = mse
    with torch.no_grad():
        return quant(torch.from_numpy(x.copy())).numpy()


CASES = [
    # kind, fmt, group, axes, zp, mse
    ("int", "int4", -1, -1, False, False),
    ("int", "int4", 32, -1, False, False),
    ("int", "int4", 32, -1, True, False),
    ("int", "int8", -1, -1, False, False),
    ("int", "int8", -2, -2, False, False),
    ("int", "int8", 0, -1, False, False),
    ("int", "int4", 32, -2, False, False),
    ("int", "int4", 64, -1, False, True),
    ("fp", "fp8_e4m3", -1, -1, False, False),
    ("fp", "fp8_e5m2", 32, -1, False, False),
    ("fp", "fp4_e2m1", 16, -1, False, False),
    ("fp", "fp4_e2m1", 16, -1, True, False),
    ("fp", "fp8_e4m3", 32, -1, False, True),
    ("mx", "int4", 32, -1, False, False),
    ("mx", "int8", 32, -1, False, False),
    ("mx", "fp4_e2m1", 32, -1, False, False),
    ("mx", "fp8_e4m3", 32, -1, False, False),
    ("nvfp", "fp4_e2m1", 16, -1, False, False),
]


@pytest.mark.parametrize("kind,fmt,group,axes,zp,mse", CASES)
def test_quantizer_parity(rng, kind, fmt, group, axes, zp, mse):
    x = rng.normal(size=(8, 128)).astype(np.float32)
    if zp:
        x = np.abs(x) + 0.5  # shifted range exercises the zero-point path
    ref = _ref_quantize(kind, fmt, group, axes, zp, mse, x)
    ours = np.asarray(
        quantize_dequant(
            Quantizer(qtype=kind, fmt=ElemFormat.from_any(fmt), group_size=group, axes=axes,
                      zero_point=zp, mse=mse),
            jnp.asarray(x),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_parity_3d_per_token(rng):
    x = rng.normal(size=(2, 9, 64)).astype(np.float32)
    ref = _ref_quantize("int", "int8", -1, -1, False, False, x)
    ours = np.asarray(
        quantize_dequant(Quantizer(qtype="int", fmt=ElemFormat.int8, group_size=-1), jnp.asarray(x))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_parity_padded_group(rng):
    # 96 columns with group 64 -> one padded group
    x = rng.normal(size=(8, 96)).astype(np.float32)
    ref = _ref_quantize("int", "int4", 64, -1, False, False, x)
    ours = np.asarray(
        quantize_dequant(Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=64), jnp.asarray(x))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
