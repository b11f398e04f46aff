"""Algorithm x architecture matrix smoke tests (beyond the llama-centric
suite): every family must survive prune + quantize end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_compressor_tpu import algorithms as alg
from llm_compressor_tpu.capture import capture_layer0
from llm_compressor_tpu.evalx import check_sparsity, compute_ppl
from llm_compressor_tpu.models import init_params, tiny_config
from llm_compressor_tpu.qformats import build_quant_config
from llm_compressor_tpu.utils.dataset import synthetic_tokens

QCFG = build_quant_config("int4-g[32]-rw", "int8-g[-1]-rw", None, None)


def _setup(arch):
    cfg = tiny_config(arch)
    params = init_params(cfg, jax.random.PRNGKey(0))
    toks = synthetic_tokens(4, 32, cfg.vocab_size, seed=1)
    ctx = capture_layer0(params, cfg, jnp.asarray(toks), chunk=2)
    stream = synthetic_tokens(1, 1, cfg.vocab_size, seed=7, eval_len=4 * 64)
    return cfg, params, ctx, stream


@pytest.mark.parametrize("arch", ["opt", "bloom", "phi", "gemma2", "qwen3"])
def test_gptq_per_arch(arch):
    cfg, params, ctx, stream = _setup(arch)
    alg.gptq(params, cfg, ctx, QCFG)
    ppl = compute_ppl(params, cfg, stream, seq_len=64, qcfg=QCFG)
    assert np.isfinite(ppl)


@pytest.mark.parametrize("arch", ["opt", "bloom", "gemma3"])
def test_wanda_per_arch(arch):
    cfg, params, ctx, stream = _setup(arch)
    alg.wanda(params, cfg, ctx, 0.3)
    assert 0.25 < check_sparsity(params, cfg, verbose=False) < 0.35
    assert np.isfinite(compute_ppl(params, cfg, stream, seq_len=64))


@pytest.mark.parametrize("arch", ["opt", "bloom", "qwen2"])
def test_smoothquant_per_arch(arch):
    cfg, params, ctx, stream = _setup(arch)
    alg.smoothquant(params, cfg, ctx, QCFG, alpha=0.8)
    assert np.isfinite(compute_ppl(params, cfg, stream, seq_len=64, qcfg=QCFG))


@pytest.mark.parametrize("arch", ["opt", "phi", "gemma2"])
def test_awq_per_arch(arch):
    cfg, params, ctx, stream = _setup(arch)
    alg.awq(params, cfg, ctx, QCFG)
    assert np.isfinite(compute_ppl(params, cfg, stream, seq_len=64, qcfg=QCFG))


def test_awq_gemma1_unsupported():
    cfg, params, ctx, _ = _setup("gemma")
    with pytest.raises(NotImplementedError):
        alg.awq(params, cfg, ctx, QCFG)
