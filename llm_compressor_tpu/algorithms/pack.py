"""Pack calibrated (fake-quantized) weights into real QTensors.

After any calibration algorithm the linear weights are bf16 values sitting
on their quantization grid. ``pack_model`` converts them to packed QTensor
storage (int4 nibbles / int8 / fp8 bytes + group scales) so the serving
path runs the fused Pallas dequant-matmul on real quantized weights.

Repacking note: calibration algorithms record their exact (scales, zeros)
in a ``scale_book`` (round 2), which ``pack_model`` consumes — packing is
lossless for every algorithm that quantized with fixed params (RTN, GPTQ,
GPTAQ, AWQ...). Only weights with NO scale_book entry fall back to
re-deriving scales with ``find_params`` on the grid-aligned values (exact
for symmetric absmax whenever a group's max code saturates; MSE-clipped
groups could repack with sub-step error on that fallback path only).
"""

from __future__ import annotations

from ..models.config import ModelConfig
from ..models.transformer import arch_slots
from ..qformats.config import QuantConfig
from ..qformats.qtensor import quantize_pack
from .common import get_weight, set_weight, weight_quantizer_for


def pack_model(params, cfg: ModelConfig, qcfg: QuantConfig,
               scale_book: dict = None, pack_head: bool = True) -> None:
    """Replace every quantizable linear weight with a packed QTensor
    (in place). Weights whose quantizer is dummy stay dense.

    ``pack_head``: when the head quantizer is set, also pack the lm_head.
    For tied-embedding models a packed lm_head copy is created (the
    embedding table itself stays dense for gathers) — decode reads the
    packed head instead of the full bf16 vocabulary projection."""
    for i, lp in enumerate(params["layers"]):
        for slot in arch_slots(cfg):
            q = weight_quantizer_for(cfg, qcfg, i, slot, mse=False)
            if q.qtype == "dummy":
                continue
            try:
                W = get_weight(lp, slot)
            except KeyError:  # slot fused away (fuse_model) — already packed
                continue
            if hasattr(W, "codes"):  # already a QTensor — idempotent
                continue
            if scale_book is not None and (i, slot) in scale_book:
                s, z = scale_book[(i, slot)]
                set_weight(lp, slot, quantize_pack(q, W, scales=s, zeros=z))
            else:
                set_weight(lp, slot, quantize_pack(q, W))
    hq = qcfg.head.weight
    if pack_head and hq.qtype != "dummy":
        W = (params["lm_head"]["weight"] if "lm_head" in params
             else params["embed"]["weight"])
        if not hasattr(W, "codes"):  # not already packed
            params.setdefault("lm_head", {})["weight"] = quantize_pack(hq, W)
