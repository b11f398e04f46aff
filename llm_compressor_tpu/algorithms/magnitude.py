"""Magnitude pruning — data-free unstructured sparsity.

Reference: llm_compressor/pruning/magnitude/core.py:17-52. Per linear:
global threshold on |W| at the sparsity quantile, zeros below it.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.transformer import arch_slots
from .common import get_weight, set_weight


def magnitude(params, cfg: ModelConfig, sparsity_ratio: float, verbose: bool = True) -> None:
    for lp in params["layers"]:
        for slot in arch_slots(cfg):
            W = get_weight(lp, slot)
            metric = jnp.abs(W)
            k = int(W.size * sparsity_ratio)
            # reference: thresh = sorted(|W|)[k]; prune metric <= thresh
            thresh = jnp.sort(metric.ravel())[k]
            set_weight(lp, slot, jnp.where(metric <= thresh, 0.0, W).astype(W.dtype))
