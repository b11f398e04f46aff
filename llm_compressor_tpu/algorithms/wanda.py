"""Wanda pruning — |W| * sqrt(mean ||x_c||^2), per-row top-k masking.

Reference: llm_compressor/pruning/wanda/core.py:22-145. Calibration inputs
flow layer by layer; the channel statistic ``scaler_row`` is the running
mean over samples of the squared channel norm; masking removes the
lowest-metric ``sparsity * cols`` entries PER ROW. Outputs of the pruned
layer become the next layer's inputs (core.py:130-137).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..capture.pipeline import CalibContext, accumulate_scaler_rows, advance
from ..models.config import ModelConfig
from ..models.transformer import arch_slots, layer_ops
from ..qformats.config import QuantConfig
from .common import get_weight, set_weight, slot_tap


def _prune_row_topk(W, scaler_row, sparsity_ratio: float):
    metric = jnp.abs(W).astype(jnp.float32) * jnp.sqrt(scaler_row)[None, :]
    k = int(W.shape[1] * sparsity_ratio)
    if k == 0:
        return W
    # per-row: zero the k smallest-metric entries
    kth = jnp.sort(metric, axis=1)[:, k - 1][:, None]
    mask = metric <= kth
    # guard against ties inflating the count beyond k is not needed for
    # parity: the reference masks exactly the k smallest by stable sort; with
    # float metrics ties are measure-zero.
    return jnp.where(mask, 0.0, W).astype(W.dtype)


def wanda(params, cfg: ModelConfig, ctx: CalibContext, sparsity_ratio: float,
          qcfg: QuantConfig | None = None, verbose: bool = True) -> None:
    """Prune in place. ``ctx`` carries the captured layer-0 inputs."""
    slots = arch_slots(cfg)
    for i, lp in enumerate(params["layers"]):
        ops = layer_ops(cfg, qcfg, i)
        taps = tuple(dict.fromkeys(slot_tap(s) for s in slots))
        scaler = accumulate_scaler_rows(ctx, lp, i, taps, ops)
        for slot in slots:
            W = get_weight(lp, slot)
            set_weight(lp, slot, _prune_row_topk(W, scaler[slot_tap(slot)], sparsity_ratio))
        advance(ctx, lp, i, ops)
