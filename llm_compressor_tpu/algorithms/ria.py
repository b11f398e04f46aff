"""RIA pruning — relative importance with activation scaling.

Reference: llm_compressor/pruning/ria/core.py:22-145. Metric:
(|W|/colsum + |W|/rowsum) * sqrt(scaler_row)^alpha, thresholded GLOBALLY per
linear at the sparsity quantile.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..capture.pipeline import CalibContext, accumulate_scaler_rows, advance
from ..models.config import ModelConfig
from ..models.transformer import arch_slots, layer_ops
from ..qformats.config import QuantConfig
from .common import get_weight, set_weight, slot_tap


def _prune_ria(W, scaler_row, sparsity_ratio: float, alpha: float):
    aw = jnp.abs(W).astype(jnp.float32)
    metric = (aw / jnp.sum(aw, axis=0)[None, :] + aw / jnp.sum(aw, axis=1)[:, None]) * (
        jnp.sqrt(scaler_row)[None, :] ** alpha
    )
    k = int(W.size * sparsity_ratio)
    thresh = jnp.sort(metric.ravel())[k]
    return jnp.where(metric <= thresh, 0.0, W).astype(W.dtype)


def ria(params, cfg: ModelConfig, ctx: CalibContext, sparsity_ratio: float,
        alpha: float = 0.5, qcfg: QuantConfig | None = None, verbose: bool = True) -> None:
    slots = arch_slots(cfg)
    for i, lp in enumerate(params["layers"]):
        ops = layer_ops(cfg, qcfg, i)
        taps = tuple(dict.fromkeys(slot_tap(s) for s in slots))
        scaler = accumulate_scaler_rows(ctx, lp, i, taps, ops)
        for slot in slots:
            W = get_weight(lp, slot)
            set_weight(lp, slot, _prune_ria(W, scaler[slot_tap(slot)], sparsity_ratio, alpha))
        advance(ctx, lp, i, ops)
