"""Shared helpers for calibration/pruning algorithms.

Maps linear slots to param-pytree paths, tap keys, and the per-architecture
sequential calibration groups (reference ``get_sequential("true")``, e.g.
models/llama.py:235-254).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..capture.pipeline import SLOT_TAP
from ..models.config import ModelConfig
from ..models.transformer import op_names
from ..qformats.config import QuantConfig
from ..qformats.quantize import Quantizer

SLOT_PATH = {
    "q": ("attn", "q"), "k": ("attn", "k"), "v": ("attn", "v"), "o": ("attn", "o"),
    "qkv": ("attn", "qkv"),
    "gate": ("mlp", "gate"), "up": ("mlp", "up"), "down": ("mlp", "down"),
    "fc1": ("mlp", "fc1"), "fc2": ("mlp", "fc2"),
}


def get_weight(layer_params, slot: str) -> jnp.ndarray:
    node = layer_params
    for k in SLOT_PATH[slot]:
        node = node[k]
    return node["weight"]


def set_weight(layer_params, slot: str, value) -> None:
    node = layer_params
    for k in SLOT_PATH[slot]:
        node = node[k]
    node["weight"] = value


def get_bias(layer_params, slot: str):
    node = layer_params
    for k in SLOT_PATH[slot]:
        node = node[k]
    return node.get("bias")


def set_bias(layer_params, slot: str, value) -> None:
    node = layer_params
    for k in SLOT_PATH[slot]:
        node = node[k]
    node["bias"] = value


def sequential_groups(cfg: ModelConfig) -> List[List[str]]:
    """Per-arch sequential calibration groups, in slot names
    (reference get_sequential(mode='true'))."""
    if cfg.fused_qkv:
        return [["qkv"], ["o"], ["fc1"], ["fc2"]]
    if cfg.mlp_style == "gated":
        return [["k", "v", "q"], ["o"], ["up", "gate"], ["down"]]
    return [["k", "v", "q"], ["o"], ["fc1"], ["fc2"]]


def slot_tap(slot: str) -> str:
    return SLOT_TAP[slot]


def weight_quantizer_for(cfg: ModelConfig, qcfg: QuantConfig, layer_idx: int,
                         slot: str, mse: bool = False) -> Quantizer:
    """Resolve the weight quantizer for a slot (MPQ-aware), with the
    algorithm's MSE-clip flag applied (the reference's ``w_clip``)."""
    from dataclasses import replace

    name = op_names(cfg, layer_idx)[slot]
    q = qcfg.for_op(name, "linear").weight
    if q.qtype != "dummy" and q.mse != mse:
        q = replace(q, mse=mse)
    return q


def head_quantizer(qcfg: QuantConfig, mse: bool = False) -> Quantizer:
    from dataclasses import replace

    q = qcfg.head.weight
    if q.qtype != "dummy" and q.mse != mse:
        q = replace(q, mse=mse)
    return q


def quantize_head_weight(params, qcfg: QuantConfig, mse: bool = False) -> None:
    """RTN-quantize the lm_head weight in place (reference rtn/core.py:48-54).
    For tied-embedding models the reference's in-place update mutates the
    shared tensor, so the embedding is quantized too — mirrored here."""
    from ..qformats.quantize import quantize_dequant

    q = head_quantizer(qcfg, mse)
    if q.qtype == "dummy":
        return
    if "lm_head" in params:
        params["lm_head"]["weight"] = quantize_dequant(q, params["lm_head"]["weight"])
    else:  # tied
        params["embed"]["weight"] = quantize_dequant(q, params["embed"]["weight"])
