"""End-to-end algorithm tests on a tiny random llama with synthetic data.

Checks mechanics (sparsity achieved, weights on quantization grid, ppl not
destroyed) for every calibration/pruning algorithm — offline, XLA CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_compressor_tpu.capture import capture_layer0
from llm_compressor_tpu.models import forward, init_params, tiny_config
from llm_compressor_tpu.qformats import build_quant_config
from llm_compressor_tpu.utils.dataset import synthetic_tokens
from llm_compressor_tpu.evalx import check_sparsity, compute_ppl
from llm_compressor_tpu import algorithms as alg


CFG = tiny_config("llama", num_layers=2)
QCFG = build_quant_config("int4-g[32]-rw", "int8-g[-1]-rw", None, "int8-g[32]-rw")
W_ONLY = build_quant_config("int4-g[32]-rw", None, None, None)


def _params():
    return init_params(CFG, jax.random.PRNGKey(0))


def _calib(n=4, t=32):
    return jnp.asarray(synthetic_tokens(n, t, CFG.vocab_size, seed=1))


def _ctx(params, n=4, t=32):
    return capture_layer0(params, CFG, _calib(n, t), chunk=2)


def _stream():
    return synthetic_tokens(1, 1, CFG.vocab_size, seed=7, eval_len=4 * 64)


def _weights_on_grid(params):
    """Every weight must equal its own round-trip quantization."""
    from llm_compressor_tpu.qformats import quantize_dequant

    W = params["layers"][0]["attn"]["q"]["weight"]
    q = QCFG.linear.weight
    return bool(jnp.allclose(quantize_dequant(q, W), W, atol=1e-6))


class TestRTN:
    def test_weights_quantized_and_model_works(self):
        params = _params()
        ref_ppl = compute_ppl(params, CFG, _stream(), seq_len=64)
        alg.rtn(params, CFG, QCFG)
        assert _weights_on_grid(params)
        q_ppl = compute_ppl(params, CFG, _stream(), seq_len=64, qcfg=QCFG)
        assert np.isfinite(q_ppl) and q_ppl < ref_ppl * 10

    def test_preserves_zeros(self):
        params = _params()
        W = params["layers"][0]["attn"]["q"]["weight"]
        W = jnp.where(jnp.abs(W) < 0.01, 0.0, W)
        params["layers"][0]["attn"]["q"]["weight"] = W
        alg.rtn(params, CFG, QCFG)
        W2 = params["layers"][0]["attn"]["q"]["weight"]
        assert bool(jnp.all(W2[W == 0] == 0))


class TestPruning:
    @pytest.mark.parametrize("method", ["magnitude", "wanda", "ria", "sparsegpt"])
    def test_sparsity_reached(self, method):
        params = _params()
        if method == "magnitude":
            alg.magnitude(params, CFG, 0.3)
        elif method == "wanda":
            alg.wanda(params, CFG, _ctx(params), 0.3)
        elif method == "ria":
            alg.ria(params, CFG, _ctx(params), 0.3, alpha=0.5)
        else:
            alg.sparsegpt(params, CFG, _ctx(params), 0.3)
        sp = check_sparsity(params, CFG, verbose=False)
        assert 0.25 < sp < 0.35, sp
        ppl = compute_ppl(params, CFG, _stream(), seq_len=64)
        assert np.isfinite(ppl)

    def test_wanda_per_row(self):
        params = _params()
        alg.wanda(params, CFG, _ctx(params), 0.25)
        W = np.asarray(params["layers"][0]["mlp"]["gate"]["weight"])
        # per-row masking: every row has exactly k zeros (ties measure-zero)
        k = int(W.shape[1] * 0.25)
        zeros_per_row = (W == 0).sum(axis=1)
        assert np.all(zeros_per_row == k), zeros_per_row


class TestGPTQFamily:
    # NOTE: GPTQ quantizes against scales solved on the PRE-update weights
    # (reference gptq/core.py:179), so re-deriving scales from the updated
    # matrix gives a different grid — "on grid" can't be asserted here.
    # Exact math parity is covered by tests/test_obs_parity.py.

    def test_gptq_end_to_end(self):
        params = _params()
        W0 = np.asarray(params["layers"][0]["attn"]["q"]["weight"]).copy()
        alg.gptq(params, CFG, _ctx(params), QCFG)
        W1 = np.asarray(params["layers"][0]["attn"]["q"]["weight"])
        assert not np.allclose(W0, W1)
        rel = np.linalg.norm(W1 - W0) / np.linalg.norm(W0)
        assert rel < 0.2, rel  # int4-g32 quantization noise, not garbage
        ppl = compute_ppl(params, CFG, _stream(), seq_len=64, qcfg=QCFG)
        assert np.isfinite(ppl)

    def test_gptaq_end_to_end(self):
        params = _params()
        W0 = np.asarray(params["layers"][0]["attn"]["q"]["weight"]).copy()
        alg.gptaq(params, CFG, _ctx(params), QCFG)
        W1 = np.asarray(params["layers"][0]["attn"]["q"]["weight"])
        assert not np.allclose(W0, W1)
        ppl = compute_ppl(params, CFG, _stream(), seq_len=64, qcfg=QCFG)
        assert np.isfinite(ppl)

    def test_prune_then_gptq_preserves_zeros(self):
        params = _params()
        alg.magnitude(params, CFG, 0.3)
        sp_before = check_sparsity(params, CFG, verbose=False)
        alg.gptq(params, CFG, _ctx(params), QCFG)
        sp_after = check_sparsity(params, CFG, verbose=False)
        assert sp_after >= sp_before - 0.01


class TestScaleFolding:
    def test_smoothquant(self):
        params = _params()
        ref = forward(params, CFG, _calib(1, 16))
        alg.smoothquant(params, CFG, _ctx(params), W_ONLY, alpha=0.5)
        assert _weights_on_grid(params)
        # scale folding alone is an identity transform; with weight-only
        # int4 the output should stay close to the fp model
        out = forward(params, CFG, _calib(1, 16), qcfg=W_ONLY)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.5, rel

    def test_smoothquant_unsupported_arch(self):
        cfg = tiny_config("phi")
        params = init_params(cfg, jax.random.PRNGKey(0))
        ctx = capture_layer0(params, cfg, _calib(2, 16), chunk=2)
        with pytest.raises(NotImplementedError):
            alg.smoothquant(params, cfg, ctx, W_ONLY)

    def test_awq(self):
        params = _params()
        ref = forward(params, CFG, _calib(1, 16))
        alg.awq(params, CFG, _ctx(params), QCFG)
        assert _weights_on_grid(params)
        out = forward(params, CFG, _calib(1, 16), qcfg=QCFG)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 1.0, rel

    def test_awq_plus(self):
        params = _params()
        W0 = np.asarray(params["layers"][0]["attn"]["q"]["weight"]).copy()
        alg.awq_plus(params, CFG, _ctx(params), _ctx(params), QCFG)
        W1 = np.asarray(params["layers"][0]["attn"]["q"]["weight"])
        assert not np.allclose(W0, W1)
        ppl = compute_ppl(params, CFG, _stream(), seq_len=64, qcfg=QCFG)
        assert np.isfinite(ppl)
