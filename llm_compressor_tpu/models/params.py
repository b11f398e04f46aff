"""Parameter pytree construction: random init + HF checkpoint loading.

The params layout consumed by transformer.py (weights in (out, in)
orientation, matching HF/torch so calibration math maps 1:1):

    params = {
      "embed": {"weight"}, ["embed_ln"], ["pos_embed"],
      ["project_in"], ["project_out"],
      "layers": [ {"ln1", ["ln2"], ["pre_ffw_norm"], ["post_ffw_norm"],
                   ["post_attn_norm"],
                   "attn": {"q","k","v","o"} | {"qkv","o"} [+ "q_norm","k_norm"],
                   "mlp": {"gate","up","down"} | {"fc1","fc2"}}, ... ],
      ["final_norm"], ["lm_head"],
    }

``load_hf_checkpoint`` maps a local HuggingFace checkpoint directory
(config.json + *.safetensors) into this pytree — the TPU equivalent of the
reference's ``Compress<X>ForCausalLM.from_pretrained`` path.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig, from_hf_config

Params = Dict[str, Any]


def _dt(cfg: ModelConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[cfg.dtype]


# ---------------------------------------------------------------------------
# Random init (tiny-config tests, benchmarks without checkpoints)
# ---------------------------------------------------------------------------


def init_params(cfg: ModelConfig, key: jax.Array, scale: float = 0.02) -> Params:
    dt = _dt(cfg)
    keys = iter(jax.random.split(key, 16 + cfg.num_layers * 16))

    def w(*shape):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dt)

    def lin(out_d, in_d, bias):
        p = {"weight": w(out_d, in_d)}
        if bias:
            p["bias"] = jnp.zeros((out_d,), dt)
        return p

    def norm():
        p = {"weight": jnp.zeros((cfg.hidden_size,), dt) if cfg.norm_weight_plus_one
             else jnp.ones((cfg.hidden_size,), dt)}
        if cfg.norm_type == "layernorm":
            p["bias"] = jnp.zeros((cfg.hidden_size,), dt)
        return p

    E = cfg.project_in_dim or cfg.hidden_size
    params: Params = {"embed": {"weight": w(cfg.vocab_size, E)}}
    if cfg.project_in_dim is not None:
        params["project_in"] = {"weight": w(cfg.hidden_size, E)}
        params["project_out"] = {"weight": w(E, cfg.hidden_size)}
    if cfg.pos_embedding == "learned":
        params["pos_embed"] = {
            "weight": w(cfg.max_position_embeddings + cfg.learned_pos_offset, cfg.hidden_size)
        }
    if cfg.embedding_layernorm:
        params["embed_ln"] = norm()

    layers = []
    for _ in range(cfg.num_layers):
        lp: Params = {"ln1": norm()}
        attn: Params = {}
        if cfg.fused_qkv:
            attn["qkv"] = lin(3 * cfg.q_size, cfg.hidden_size, cfg.attention_bias)
        else:
            attn["q"] = lin(cfg.q_size, cfg.hidden_size, cfg.attention_bias)
            attn["k"] = lin(cfg.kv_size, cfg.hidden_size, cfg.attention_bias)
            attn["v"] = lin(cfg.kv_size, cfg.hidden_size, cfg.attention_bias)
        attn["o"] = lin(cfg.hidden_size, cfg.q_size, cfg.attention_out_bias)
        if cfg.qk_norm or cfg.qk_layernorm:
            base = jnp.zeros if cfg.norm_weight_plus_one else jnp.ones
            attn["q_norm"] = {"weight": base((cfg.head_dim,), dt)}
            attn["k_norm"] = {"weight": base((cfg.head_dim,), dt)}
            if cfg.qk_layernorm:
                attn["q_norm"]["bias"] = jnp.zeros((cfg.head_dim,), dt)
                attn["k_norm"]["bias"] = jnp.zeros((cfg.head_dim,), dt)
        lp["attn"] = attn

        if cfg.mlp_style == "gated":
            lp["mlp"] = {
                "gate": lin(cfg.intermediate_size, cfg.hidden_size, cfg.mlp_bias),
                "up": lin(cfg.intermediate_size, cfg.hidden_size, cfg.mlp_bias),
                "down": lin(cfg.hidden_size, cfg.intermediate_size, cfg.mlp_bias),
            }
        else:
            lp["mlp"] = {
                "fc1": lin(cfg.intermediate_size, cfg.hidden_size, cfg.mlp_bias),
                "fc2": lin(cfg.hidden_size, cfg.intermediate_size, cfg.mlp_bias),
            }

        if cfg.pre_post_ffw_norm:
            lp["pre_ffw_norm"] = norm()
            lp["post_ffw_norm"] = norm()
        elif not cfg.parallel_residual:
            lp["ln2"] = norm()
        if cfg.post_attn_residual_norm:
            lp["post_attn_norm"] = norm()
        layers.append(lp)
    params["layers"] = layers

    if cfg.final_norm:
        params["final_norm"] = norm()
    if not cfg.tie_word_embeddings:
        params["lm_head"] = lin(cfg.vocab_size, cfg.hidden_size, cfg.arch == "phi")
    return params


# ---------------------------------------------------------------------------
# HF checkpoint mapping
# ---------------------------------------------------------------------------


def _hf_key_map(cfg: ModelConfig, i: int) -> Dict[str, tuple]:
    """HF param name -> (pytree path) for layer i."""
    if cfg.arch in ("llama", "qwen2", "qwen3", "gemma", "gemma2", "gemma3"):
        p = f"model.layers.{i}"
        m = {
            f"{p}.self_attn.q_proj": ("attn", "q"),
            f"{p}.self_attn.k_proj": ("attn", "k"),
            f"{p}.self_attn.v_proj": ("attn", "v"),
            f"{p}.self_attn.o_proj": ("attn", "o"),
            f"{p}.mlp.gate_proj": ("mlp", "gate"),
            f"{p}.mlp.up_proj": ("mlp", "up"),
            f"{p}.mlp.down_proj": ("mlp", "down"),
            f"{p}.input_layernorm": ("ln1",),
        }
        if cfg.qk_norm:
            m[f"{p}.self_attn.q_norm"] = ("attn", "q_norm")
            m[f"{p}.self_attn.k_norm"] = ("attn", "k_norm")
        if cfg.pre_post_ffw_norm:
            m[f"{p}.post_attention_layernorm"] = ("post_attn_norm",)
            m[f"{p}.pre_feedforward_layernorm"] = ("pre_ffw_norm",)
            m[f"{p}.post_feedforward_layernorm"] = ("post_ffw_norm",)
        else:
            m[f"{p}.post_attention_layernorm"] = ("ln2",)
        return m
    if cfg.arch == "opt":
        p = f"model.decoder.layers.{i}"
        return {
            f"{p}.self_attn.q_proj": ("attn", "q"),
            f"{p}.self_attn.k_proj": ("attn", "k"),
            f"{p}.self_attn.v_proj": ("attn", "v"),
            f"{p}.self_attn.out_proj": ("attn", "o"),
            f"{p}.fc1": ("mlp", "fc1"),
            f"{p}.fc2": ("mlp", "fc2"),
            f"{p}.self_attn_layer_norm": ("ln1",),
            f"{p}.final_layer_norm": ("ln2",),
        }
    if cfg.arch == "bloom":
        p = f"transformer.h.{i}"
        return {
            f"{p}.self_attention.query_key_value": ("attn", "qkv"),
            f"{p}.self_attention.dense": ("attn", "o"),
            f"{p}.mlp.dense_h_to_4h": ("mlp", "fc1"),
            f"{p}.mlp.dense_4h_to_h": ("mlp", "fc2"),
            f"{p}.input_layernorm": ("ln1",),
            f"{p}.post_attention_layernorm": ("ln2",),
        }
    if cfg.arch == "phi":
        p = f"model.layers.{i}"
        m = {
            f"{p}.self_attn.q_proj": ("attn", "q"),
            f"{p}.self_attn.k_proj": ("attn", "k"),
            f"{p}.self_attn.v_proj": ("attn", "v"),
            f"{p}.self_attn.dense": ("attn", "o"),
            f"{p}.mlp.fc1": ("mlp", "fc1"),
            f"{p}.mlp.fc2": ("mlp", "fc2"),
            f"{p}.input_layernorm": ("ln1",),
        }
        if cfg.qk_layernorm:
            m[f"{p}.self_attn.q_layernorm"] = ("attn", "q_norm")
            m[f"{p}.self_attn.k_layernorm"] = ("attn", "k_norm")
        return m
    raise ValueError(cfg.arch)


def _hf_top_map(cfg: ModelConfig) -> Dict[str, tuple]:
    if cfg.arch in ("llama", "qwen2", "qwen3", "gemma", "gemma2", "gemma3"):
        m = {"model.embed_tokens": ("embed",), "model.norm": ("final_norm",)}
    elif cfg.arch == "opt":
        m = {
            "model.decoder.embed_tokens": ("embed",),
            "model.decoder.embed_positions": ("pos_embed",),
            "model.decoder.final_layer_norm": ("final_norm",),
        }
        if cfg.project_in_dim is not None:
            m["model.decoder.project_in"] = ("project_in",)
            m["model.decoder.project_out"] = ("project_out",)
    elif cfg.arch == "bloom":
        m = {
            "transformer.word_embeddings": ("embed",),
            "transformer.word_embeddings_layernorm": ("embed_ln",),
            "transformer.ln_f": ("final_norm",),
        }
    elif cfg.arch == "phi":
        m = {"model.embed_tokens": ("embed",), "model.final_layernorm": ("final_norm",)}
    else:
        raise ValueError(cfg.arch)
    if not cfg.tie_word_embeddings:
        m["lm_head"] = ("lm_head",)
    return m


def load_params_from_state_dict(cfg: ModelConfig, sd: Dict[str, np.ndarray]) -> Params:
    """Map a flat HF state dict (numpy arrays) into the params pytree."""
    dt = _dt(cfg)
    params: Params = {"layers": [dict() for _ in range(cfg.num_layers)]}

    def put(tree, path, leaf, value):
        node = tree
        for k in path:
            node = node.setdefault(k, {})
        node[leaf] = jnp.asarray(value).astype(dt)

    def consume(mapping, tree):
        for hf_name, path in mapping.items():
            wkey, bkey = hf_name + ".weight", hf_name + ".bias"
            if wkey in sd:
                put(tree, path, "weight", sd[wkey])
            if bkey in sd:
                put(tree, path, "bias", sd[bkey])

    consume(_hf_top_map(cfg), params)
    for i in range(cfg.num_layers):
        consume(_hf_key_map(cfg, i), params["layers"][i])
    if cfg.arch == "bloom" and cfg.fused_qkv:
        # HF BLOOM fused QKV is stored (H, 3, D, hidden) flattened; our
        # forward reshapes (..., H, 3, D), which is the same layout — no
        # permute needed.
        pass
    return params


def save_compressed(params, cfg: ModelConfig, path: "str | Path",
                    hf_config: Optional[dict] = None,
                    tokenizer_path: Optional[str] = None) -> None:
    """Write an HF-style checkpoint of the compressed model
    (reference save_compressed, models/llama.py:210-230).

    Fake-quantized / pruned weights export as a standard safetensors state
    dict under the original HF parameter names, so the result loads
    directly into ``transformers`` or back into this framework. Packed
    QTensor weights are dequantized for the HF export (a native packed
    format ships alongside as packed.npz: codes/scales/zeros per op).
    """
    import numpy as np
    from safetensors.numpy import save_file

    from ..qformats.qtensor import QTensor, dequantize

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    sd: Dict[str, np.ndarray] = {}
    packed: Dict[str, np.ndarray] = {}

    def emit(hf_name, node):
        for leaf in ("weight", "bias"):
            if leaf in node:
                v = node[leaf]
                if isinstance(v, QTensor):
                    packed[f"{hf_name}.{leaf}.codes"] = np.asarray(v.codes)
                    packed[f"{hf_name}.{leaf}.scales"] = np.asarray(v.scales)
                    if v.zeros is not None:
                        packed[f"{hf_name}.{leaf}.zeros"] = np.asarray(v.zeros)
                    if v.pair_planes:  # int4 nibble layout marker (absent
                        packed[f"{hf_name}.{leaf}.pair"] = np.asarray(True)
                    v = dequantize(v)  # = legacy "group halves", pre-r5)
                sd[f"{hf_name}.{leaf}"] = np.asarray(v.astype(jnp.float32)).astype(np.float32)

    def walk(mapping, tree):
        for hf_name, p in mapping.items():
            node = tree
            ok = True
            for k in p:
                if k not in node:
                    ok = False
                    break
                node = node[k]
            if ok:
                emit(hf_name, node)

    walk(_hf_top_map(cfg), params)
    for i in range(cfg.num_layers):
        walk(_hf_key_map(cfg, i), params["layers"][i])

    save_file(sd, str(path / "model.safetensors"))
    if packed:
        np.savez(path / "packed.npz", **packed)
    if hf_config is not None:
        (path / "config.json").write_text(json.dumps(hf_config, indent=2))
    if tokenizer_path is not None:
        try:
            from transformers import AutoTokenizer

            AutoTokenizer.from_pretrained(tokenizer_path).save_pretrained(str(path))
        except Exception:
            pass


def load_compressed(path: "str | Path", cfg: ModelConfig,
                    qcfg=None) -> Params:
    """Round-trip of :func:`save_compressed`: rebuild params from
    model.safetensors, re-packing QTensors from packed.npz when present
    (codes/scales are the exact calibrated payload — no re-quantization)."""
    from safetensors.numpy import load_file

    from ..qformats.qtensor import QTensor

    path = Path(path)
    sd = load_file(str(path / "model.safetensors"))
    params = load_params_from_state_dict(cfg, sd)
    packed_file = path / "packed.npz"
    if packed_file.exists() and qcfg is not None:
        from ..models.transformer import arch_slots, op_names
        from ..qformats.blocking import resolve_group
        from ..algorithms.common import SLOT_PATH

        data = np.load(packed_file)
        for i, lp in enumerate(params["layers"]):
            names = op_names(cfg, i)
            for slot in arch_slots(cfg):
                hf = {v: k for k, v in _hf_key_map(cfg, i).items()}[SLOT_PATH[slot]]
                ck, sk = f"{hf}.weight.codes", f"{hf}.weight.scales"
                if ck not in data:
                    continue
                q = qcfg.for_op(names[slot], "linear").weight
                node = lp
                for k in SLOT_PATH[slot]:
                    node = node[k]
                W_shape = tuple(sd[f"{hf}.weight"].shape)
                codes = jnp.asarray(data[ck])
                scales = jnp.asarray(data[sk])
                zk = f"{hf}.weight.zeros"
                zeros = jnp.asarray(data[zk]) if zk in data else None
                group, axes = resolve_group(q.group_size, q.eff_axes, W_shape)
                n_groups = scales.shape[1] if scales.ndim >= 2 else 1
                blocked = (W_shape[0], n_groups, group)
                from ..qformats.qtensor import scale_strip
                node["weight"] = QTensor(
                    codes=codes, scales=scales, zeros=zeros, quantizer=q,
                    shape=W_shape, blocked_shape=blocked,
                    group_axis=2, ngroups_axis=1,
                    dtype=_dt(cfg),
                    scales_t=scale_strip(q, W_shape, scales),
                    pair_planes=(f"{hf}.weight.pair" in data
                                 and bool(data[f"{hf}.weight.pair"])),
                )
    return params


def load_hf_checkpoint(path: "str | Path", dtype: Optional[str] = None):
    """Load (cfg, params) from a local HF checkpoint directory."""
    from safetensors.numpy import load_file

    path = Path(path)
    hf_cfg = json.loads((path / "config.json").read_text())
    cfg = from_hf_config(hf_cfg)
    if dtype is not None:
        from dataclasses import replace
        cfg = replace(cfg, dtype=dtype)
    sd: Dict[str, np.ndarray] = {}
    files = sorted(path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors files in {path}")
    for f in files:
        sd.update(load_file(str(f)))
    return cfg, load_params_from_state_dict(cfg, sd)
