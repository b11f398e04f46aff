"""SparseGPT — blocked OBS one-shot pruning.

Reference: llm_compressor/pruning/sparsegpt/core.py:23-228. Hessians are
accumulated per linear (all linears at once — no sequential grouping), then
each weight is pruned by the per-block W^2/diag(Hinv)^2 criterion with
error compensation. Outputs of the pruned layer feed the next layer.
"""

from __future__ import annotations

from ..capture.pipeline import CalibContext, accumulate_hessian, advance
from ..models.config import ModelConfig
from ..models.transformer import arch_slots, layer_ops
from ..qformats.config import QuantConfig
from .common import get_weight, set_weight, slot_tap
from .obs import sparsegpt_update


def sparsegpt(params, cfg: ModelConfig, ctx: CalibContext, sparsity_ratio: float,
              qcfg: QuantConfig | None = None, blocksize: int = 128,
              verbose: bool = True) -> None:
    slots = arch_slots(cfg)
    for i, lp in enumerate(params["layers"]):
        ops = layer_ops(cfg, qcfg, i)
        taps = tuple(dict.fromkeys(slot_tap(s) for s in slots))
        H, _ = accumulate_hessian(ctx, lp, i, taps, ops)
        for slot in slots:
            W = get_weight(lp, slot)
            Wp = sparsegpt_update(W, H[slot_tap(slot)], sparsity_ratio, blocksize=blocksize)
            set_weight(lp, slot, Wp.astype(W.dtype))
        advance(ctx, lp, i, ops)
