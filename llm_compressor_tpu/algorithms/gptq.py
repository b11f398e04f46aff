"""GPTQ — Hessian-weighted error-compensated weight quantization.

Reference: llm_compressor/quantization/calibrations/gptq/core.py:23-281.
Per layer, per sequential group: accumulate H = 2/n * X X^T from the inputs
of the group's linears (with earlier groups already quantized — the layer is
re-run per group), then run the blocked OBS update per linear. Outputs of
the fully-updated layer become the next layer's inputs.
"""

from __future__ import annotations

from ..capture.pipeline import CalibContext, accumulate_hessian, advance
from ..models.config import ModelConfig
from ..models.transformer import layer_ops
from ..qformats.config import QuantConfig
from .common import (
    get_weight,
    quantize_head_weight,
    sequential_groups,
    set_weight,
    slot_tap,
    weight_quantizer_for,
)
from .obs import gptq_update_with_params


def gptq(params, cfg: ModelConfig, ctx: CalibContext, qcfg: QuantConfig,
         mse: bool = False, blocksize: int = 128, actorder: bool = True,
         scale_book: dict = None, verbose: bool = True) -> None:
    for i, lp in enumerate(params["layers"]):
        ops = layer_ops(cfg, qcfg, i)
        for group in sequential_groups(cfg):
            tap = slot_tap(group[0])
            H, _ = accumulate_hessian(ctx, lp, i, (tap,), ops)
            for slot in group:
                qz = weight_quantizer_for(cfg, qcfg, i, slot, mse)
                if qz.qtype == "dummy":
                    continue
                W = get_weight(lp, slot)
                Q, s, z = gptq_update_with_params(W, H[tap], qz,
                                                  blocksize=blocksize,
                                                  actorder=actorder)
                set_weight(lp, slot, Q.astype(W.dtype))
                if scale_book is not None:
                    scale_book[(i, slot)] = (s, z)
        advance(ctx, lp, i, ops)
    quantize_head_weight(params, qcfg, mse)
