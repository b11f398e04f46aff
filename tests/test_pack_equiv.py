"""Lossless-packing invariant: for every calibrated path that records a
``scale_book``, packing with the book and dequantizing reproduces the
fake-quantized weights BITWISE (algorithms/pack.py:7-13, CLAUDE.md design
invariants). Covers the two paths VERDICT flagged: AWQ post-clip (scales
solved on clipped+scaled weights inside the final RTN) and GPTQ act-order
(group scales solved on the permuted W, unpermuted for the book).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_compressor_tpu import algorithms as alg
from llm_compressor_tpu.algorithms.common import get_weight, weight_quantizer_for
from llm_compressor_tpu.capture import capture_layer0
from llm_compressor_tpu.models import init_params, tiny_config
from llm_compressor_tpu.models.transformer import arch_slots
from llm_compressor_tpu.qformats import build_quant_config
from llm_compressor_tpu.qformats.qtensor import dequantize, quantize_pack
from llm_compressor_tpu.utils.dataset import synthetic_tokens


def _setup(weight_spec="int4-g[32]-rw"):
    cfg = tiny_config("llama", hidden_size=64, intermediate_size=128,
                      num_heads=2, num_kv_heads=2, head_dim=32, num_layers=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    qcfg = build_quant_config(weight_spec, None, None, None)
    toks = jnp.asarray(synthetic_tokens(2, 16, cfg.vocab_size, 0))
    ctx = capture_layer0(params, cfg, toks, chunk=2)
    return cfg, params, qcfg, ctx


def _assert_pack_lossless(params, cfg, qcfg, scale_book):
    checked = 0
    for i, lp in enumerate(params["layers"]):
        for slot in arch_slots(cfg):
            q = weight_quantizer_for(cfg, qcfg, i, slot, mse=False)
            if q.qtype == "dummy":
                continue
            W = get_weight(lp, slot)
            assert (i, slot) in scale_book, f"missing book entry {(i, slot)}"
            s, z = scale_book[(i, slot)]
            qt = quantize_pack(q, W, scales=s, zeros=z)
            W2 = dequantize(qt)
            np.testing.assert_array_equal(
                np.asarray(W2, np.float32), np.asarray(W, np.float32),
                err_msg=f"layer {i} slot {slot} repacked inexactly")
            checked += 1
    assert checked > 0


def test_awq_pack_lossless():
    cfg, params, qcfg, ctx = _setup()
    book = {}
    alg.awq(params, cfg, ctx, qcfg, do_clip=True, scale_book=book, verbose=False)
    _assert_pack_lossless(params, cfg, qcfg, book)


@pytest.mark.parametrize("actorder", [True, False])
def test_gptq_pack_lossless(actorder):
    cfg, params, qcfg, ctx = _setup()
    book = {}
    alg.gptq(params, cfg, ctx, qcfg, actorder=actorder, scale_book=book,
             verbose=False)
    _assert_pack_lossless(params, cfg, qcfg, book)


def test_spinquant_pack_lossless():
    """SpinQuant-hadamard's internal GPTQ threads the scale_book too
    (VERDICT r2 item 4): pack after rotation+GPTQ is bitwise lossless."""
    cfg = tiny_config("llama", hidden_size=64, intermediate_size=128,
                      num_heads=2, num_kv_heads=2, head_dim=32, num_layers=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    qcfg = build_quant_config("int4-g[32]-rw", None, None, None)
    toks = jnp.asarray(synthetic_tokens(2, 16, cfg.vocab_size, 0))
    book = {}
    cfg = alg.spinquant(params, cfg, toks, qcfg, mode="hadamard",
                        scale_book=book, verbose=False)
    _assert_pack_lossless(params, cfg, qcfg, book)


def test_pack_model_uses_book():
    """pack_model(scale_book=...) forward == fake-quant forward bitwise on
    the packed-dequant reference path."""
    from llm_compressor_tpu.qformats import QTensor

    cfg, params, qcfg, ctx = _setup()
    book = {}
    alg.awq(params, cfg, ctx, qcfg, scale_book=book, verbose=False)
    fake = {(i, s): np.asarray(get_weight(lp, s), np.float32)
            for i, lp in enumerate(params["layers"]) for s in arch_slots(cfg)}
    alg.pack_model(params, cfg, qcfg, scale_book=book)
    for i, lp in enumerate(params["layers"]):
        for slot in arch_slots(cfg):
            qt = get_weight(lp, slot)
            assert isinstance(qt, QTensor)
            np.testing.assert_array_equal(
                np.asarray(dequantize(qt), np.float32), fake[(i, slot)])
