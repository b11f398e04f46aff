"""acts_mode — mapping of attention-matmul quantizer configs onto the
serving decode-attention modes (engine/generate.py), and closeness of the
int8-codes decode attention to the unquantized float path."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_compressor_tpu.engine import decode_step, init_cache, prefill
from llm_compressor_tpu.engine.generate import acts_mode
from llm_compressor_tpu.models import init_params, tiny_config
from llm_compressor_tpu.models.transformer import layer_ops
from llm_compressor_tpu.qformats import build_quant_config


def _ops(qspec):
    cfg = tiny_config("llama", num_layers=1)
    qcfg = build_quant_config(*qspec) if qspec else None
    return layer_ops(cfg, qcfg, 0)


def test_acts_mode_mapping():
    assert acts_mode(None, None) is False                    # unquantized
    o = _ops(("int4-g[32]-rw", "int8-g[-1]-rw", None, None))  # W4A8 headline
    assert acts_mode(o.qk, o.sv) is True
    o = _ops(("int4-g[32]-rw", "int8-g[32]-rw", None, None))  # grouped acts
    assert acts_mode(o.qk, o.sv) is None
    o = _ops(("int4-g[32]-rw", "int8-g[-1]-rw", "int8-g[-1]-rw", None))
    assert acts_mode(o.qk, o.sv) is None                      # act_out set


def test_codes_attention_close_to_float():
    """The int8-codes decode attention (engaged by the W4A8 act config on a
    quantized cache) approximates the unquantized float attention on the
    same stored codes — the difference is the int8 act quantization the
    config asks for."""
    cfg = tiny_config("llama", num_layers=2, dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    qcfg = build_quant_config(None, "int8-g[-1]-rw", None, None)
    toks = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 10)).astype(np.int32)

    def run(q):
        cache = init_cache(cfg.num_layers, 2, 16, cfg.num_kv_heads,
                           cfg.head_dim, quantized=True)
        logits, cache = prefill(params, jnp.asarray(toks[:, :9]), cache,
                                cfg=cfg, qcfg=q)
        logits, _ = decode_step(params, jnp.asarray(toks[:, 9:]), cache,
                                cfg=cfg, qcfg=q)
        return np.asarray(logits)

    f = run(None)        # float path (acts_mode False)
    i = run(qcfg)        # int8-codes path (acts_mode True)
    err = np.abs(f - i).max() / (np.abs(f).max() + 1e-9)
    assert err < 0.08, err
    assert not np.allclose(f, i)  # the quantizers actually ran
