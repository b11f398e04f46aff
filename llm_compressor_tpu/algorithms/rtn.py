"""RTN — round-to-nearest weight quantization (no calibration data).

Reference: llm_compressor/quantization/calibrations/rtn/core.py:17-60.
Per linear: W <- fake_quantize(W) * (W != 0) — the sparsity-mask multiply
preserves previously pruned zeros. The lm_head is quantized with the head
config. Purely data-free, so it is a single vectorized pass.
"""

from __future__ import annotations

from ..models.config import ModelConfig
from ..models.transformer import arch_slots
from ..qformats.config import QuantConfig
from ..qformats.quantize import quantize_dequant_with_params
from .common import get_weight, quantize_head_weight, set_weight, weight_quantizer_for


def rtn(params, cfg: ModelConfig, qcfg: QuantConfig, mse: bool = False,
        scale_book: dict = None, verbose: bool = True) -> None:
    """Quantize all linear weights in place (params mutated). When
    ``scale_book`` is given, the exact solved (scales, zeros) per (layer,
    slot) are recorded for lossless packing."""
    for i, lp in enumerate(params["layers"]):
        for slot in arch_slots(cfg):
            q = weight_quantizer_for(cfg, qcfg, i, slot, mse)
            if q.qtype == "dummy":
                continue
            W = get_weight(lp, slot)
            mask = (W != 0).astype(W.dtype)
            dq, (s, z) = quantize_dequant_with_params(q, W)
            set_weight(lp, slot, dq * mask)
            if scale_book is not None:
                scale_book[(i, slot)] = (s, z)
    quantize_head_weight(params, qcfg, mse)
