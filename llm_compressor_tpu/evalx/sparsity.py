"""Model sparsity check (reference utils/module.py:67-100)."""

from __future__ import annotations

import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.transformer import arch_slots
from ..algorithms.common import get_weight
from ..utils.logging import LOGGER


def check_sparsity(params, cfg: ModelConfig, verbose: bool = True) -> float:
    count = 0
    total = 0
    for i, lp in enumerate(params["layers"]):
        sub_count, sub_total = 0, 0
        for slot in arch_slots(cfg):
            W = get_weight(lp, slot)
            sub_count += int(jnp.sum(W == 0))
            sub_total += W.size
        if verbose:
            LOGGER.debug(f"Layer {i} sparsity : {sub_count / sub_total:.4f}")
        count += sub_count
        total += sub_total
    sparsity = count / total
    if verbose:
        LOGGER.info(f"Model sparsity : {sparsity:.4f}")
    return sparsity
