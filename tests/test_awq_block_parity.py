"""AWQ scale parity driving the reference's OWN ``auto_scale_block``
(VERDICT r2 item 7): a real tiny transformers ``LlamaDecoderLayer`` with
reference INTQuantizers attached runs the reference search end-to-end
(`/root/reference/llm_compressor/quantization/calibrations/awq/
auto_scale.py:69-258`), and every returned scale vector must match our
``_search_scale`` on the same weights/activations — no transcription
in the loop (unlike test_awq_parity's closure re-execution).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# installs the reference-module stubs (loguru / utils package) and exposes
# INTQuantizer + _load_ref
import test_obs_parity as harness  # noqa: E402


def _get_op_name(module, op):
    for name, m in module.named_modules():
        if m is op:
            return name
    raise ValueError("op not found")


# auto_scale.py imports get_op_name/get_op_by_name from the stubbed
# utils.module — give it real implementations
sys.modules["utils.module"].get_op_name = _get_op_name
sys.modules["utils.module"].get_op_by_name = (
    lambda module, name: dict(module.named_modules())[name])

ref_auto_scale = harness._load_ref(
    "ref_awq_auto_scale",
    harness.REF + "/quantization/calibrations/awq/auto_scale.py")

import jax.numpy as jnp  # noqa: E402

from llm_compressor_tpu.algorithms.awq import _search_scale, scale_pairs  # noqa: E402
from llm_compressor_tpu.models import make_causal_mask, rope_for_layer, tiny_config  # noqa: E402
from llm_compressor_tpu.qformats import ElemFormat, Quantizer  # noqa: E402

INTQuantizer = harness.INTQuantizer
RefFmt = harness.RefFmt

H, KV, D, E, I, G = 2, 2, 32, 64, 128, 16
B, T = 2, 16


def _build_ref_layer():
    from transformers.models.llama.configuration_llama import LlamaConfig
    from transformers.models.llama.modeling_llama import (
        LlamaDecoderLayer,
        LlamaRotaryEmbedding,
    )

    hf = LlamaConfig(
        hidden_size=E, intermediate_size=I, num_attention_heads=H,
        num_key_value_heads=KV, head_dim=D, num_hidden_layers=1,
        vocab_size=256, rope_theta=10000.0, rms_norm_eps=1e-6,
        attention_dropout=0.0, attn_implementation="eager")
    torch.manual_seed(3)
    layer = LlamaDecoderLayer(hf, layer_idx=0).float().eval()
    for _, m in layer.named_modules():
        if isinstance(m, torch.nn.Linear):
            q = INTQuantizer(format=RefFmt.int4, group_size=G, axes=-1,
                             zero_point=False)
            q.mse = False
            m.weight_quantizer = q

    rng = np.random.default_rng(11)
    x = rng.normal(size=(B, T, E)).astype(np.float32)
    x *= (1.0 + 4.0 * np.abs(rng.normal(size=(E,)))).astype(np.float32)
    xt = torch.from_numpy(x)
    pid = torch.arange(T)[None, :].expand(B, T)
    cos, sin = LlamaRotaryEmbedding(config=hf)(xt, pid)
    mask4 = torch.full((1, 1, T, T), torch.finfo(torch.float32).min).triu(1)

    feats = {}
    names = ["self_attn.q_proj", "self_attn.o_proj",
             "mlp.gate_proj", "mlp.down_proj"]
    mods = dict(layer.named_modules())
    handles = [mods[n].register_forward_hook(
        (lambda n: lambda m, inp, out: feats.__setitem__(n, inp[0].detach()))(n))
        for n in names]
    with torch.no_grad():
        layer(xt, attention_mask=mask4, position_ids=pid,
              position_embeddings=(cos, sin))
    for h in handles:
        h.remove()
    kwargs = {"attention_mask": mask4, "position_embeddings": (cos, sin)}
    return layer, kwargs, feats


def test_awq_auto_scale_block_parity():
    layer, kwargs, feats = _build_ref_layer()
    with torch.no_grad():
        ref_list = ref_auto_scale.auto_scale_block(layer, kwargs, feats)
    assert len(ref_list) == 4  # qkv, o, gate/up, down (v/o same shape here)
    ref_scales = {names: s.numpy() for _, names, s in ref_list}

    # our side: same weights as a param pytree, same captured activations
    cfg = tiny_config("llama", hidden_size=E, intermediate_size=I,
                      num_heads=H, num_kv_heads=KV, head_dim=D, num_layers=1,
                      rope_theta=10000.0, rms_norm_eps=1e-6)
    w = lambda m: jnp.asarray(m.weight.detach().numpy())
    sa, ml = layer.self_attn, layer.mlp
    lp = {
        "attn": {"q": {"weight": w(sa.q_proj)}, "k": {"weight": w(sa.k_proj)},
                 "v": {"weight": w(sa.v_proj)}, "o": {"weight": w(sa.o_proj)}},
        "mlp": {"gate": {"weight": w(ml.gate_proj)},
                "up": {"weight": w(ml.up_proj)},
                "down": {"weight": w(ml.down_proj)}},
        "ln1": {"weight": jnp.asarray(layer.input_layernorm.weight.detach().numpy())},
        "ln2": {"weight": jnp.asarray(
            layer.post_attention_layernorm.weight.detach().numpy())},
    }
    taps = {"attn_in": feats["self_attn.q_proj"], "o_in": feats["self_attn.o_proj"],
            "mlp_in": feats["mlp.gate_proj"], "down_in": feats["mlp.down_proj"]}
    quantizers = {s: Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=G)
                  for s in ("q", "k", "v", "o", "gate", "up", "down")}
    ref_key = {"attn_in": ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
               "o_in": ("self_attn.o_proj",),
               "mlp_in": ("mlp.gate_proj", "mlp.up_proj"),
               "down_in": ("mlp.down_proj",)}

    p = jnp.arange(T)[None, :].repeat(B, 0)
    cos, sin = rope_for_layer(cfg, 0, p)
    mask = make_causal_mask(cfg, 0, p, p)
    pairs = scale_pairs(cfg, lp)
    assert len(pairs) == 4
    for pair in pairs:
        x = jnp.asarray(taps[pair.tap].numpy())
        ours = np.asarray(_search_scale(cfg, lp, None, pair, x, cos, sin,
                                        mask, quantizers))
        np.testing.assert_allclose(
            ours, ref_scales[ref_key[pair.tap]], rtol=1e-4, atol=1e-5,
            err_msg=f"pair {pair.tap}: scale mismatch vs reference "
                    f"auto_scale_block")
