"""SmoothQuant — fold activation outliers into the preceding norm.

Reference: llm_compressor/quantization/calibrations/smoothquant/
{core.py:28-141, auto_scale.py:19-170}. Per block: per-channel activation
absmax and weight column absmax give s = act^alpha / weight^(1-alpha); the
scale divides the preceding LayerNorm/RMSNorm (weight and bias) and
multiplies the following linears' input columns. Finishes with RTN.

Arch support mirrors the reference exactly: OPT (except 350M), BLOOM, and
the Llama/Qwen2/Qwen3 family only (auto_scale.py:73-144) — Phi/Gemma raise.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from ..capture.pipeline import CalibContext, advance, run_layer
from ..models.config import ModelConfig
from ..models.transformer import layer_ops
from ..qformats.config import QuantConfig
from .common import get_weight, set_weight
from .rtn import rtn

# (norm param key, linear slots fed by it, tap key) per supported arch
def _scale_pairs(cfg: ModelConfig) -> List[Tuple[str, List[str], str]]:
    if cfg.arch == "opt":
        if cfg.project_in_dim is not None:  # OPT-350M: unsupported in reference
            return []
        return [("ln1", ["q", "k", "v"], "attn_in"), ("ln2", ["fc1"], "mlp_in")]
    if cfg.arch == "bloom":
        return [("ln1", ["qkv"], "attn_in"), ("ln2", ["fc1"], "mlp_in")]
    if cfg.arch in ("llama", "qwen2", "qwen3"):
        return [("ln1", ["q", "k", "v"], "attn_in"), ("ln2", ["gate", "up"], "mlp_in")]
    raise NotImplementedError(
        f"SmoothQuant scale map not defined for arch {cfg.arch!r} "
        "(parity with reference auto_scale.py:73-144)"
    )


def _act_absmax(ctx: CalibContext, lp, layer_idx, ops, tap_keys):
    """Per-channel absmax of tap activations over all calibration tokens."""
    acc = {}
    for _, _, _, taps in run_layer(ctx, lp, layer_idx, ops, tap_keys):
        for k, x in taps.items():
            m = jnp.max(jnp.abs(x.reshape(-1, x.shape[-1]).astype(jnp.float32)), axis=0)
            acc[k] = m if k not in acc else jnp.maximum(acc[k], m)
    return acc


def smoothquant(params, cfg: ModelConfig, ctx: CalibContext, qcfg: QuantConfig,
                alpha: float = 0.5, mse: bool = False, scale_book: dict = None,
                verbose: bool = True) -> None:
    pairs = _scale_pairs(cfg)
    for i, lp in enumerate(params["layers"]):
        ops = layer_ops(cfg, qcfg, i)
        tap_keys = tuple(dict.fromkeys(t for _, _, t in pairs))
        act_max = _act_absmax(ctx, lp, i, ops, tap_keys)
        # Propagate with the ORIGINAL (pre-smoothing) layer, matching the
        # reference which advances before applying scales (core.py:116-118).
        advance(ctx, lp, i, ops)

        for norm_key, slots, tap in pairs:
            a = act_max[tap]
            w_max = None
            for slot in slots:
                wm = jnp.max(jnp.abs(get_weight(lp, slot).astype(jnp.float32)), axis=0)
                w_max = wm if w_max is None else jnp.maximum(w_max, wm)
            w_max = jnp.maximum(w_max, 1e-5)
            scales = jnp.clip(a**alpha / w_max ** (1.0 - alpha), 1e-5, None)

            norm = lp[norm_key]
            norm["weight"] = (norm["weight"].astype(jnp.float32) / scales).astype(norm["weight"].dtype)
            if "bias" in norm and norm["bias"] is not None:
                norm["bias"] = (norm["bias"].astype(jnp.float32) / scales).astype(norm["bias"].dtype)
            for slot in slots:
                W = get_weight(lp, slot)
                set_weight(lp, slot, (W.astype(jnp.float32) * scales[None, :]).astype(W.dtype))

    rtn(params, cfg, qcfg, mse=mse, scale_book=scale_book, verbose=False)
