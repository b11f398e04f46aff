"""capture — functional activation capture + layerwise calibration driver.

The TPU replacement for the reference's Catcher/forward-hook machinery
(reference: gptq/core.py:54-127): layer-0 inputs come from running the
embedding explicitly; per-linear inputs come from the transformer core's
``taps`` mechanism; statistics (Hessians, channel norms, absmax) are
accumulated with jitted chunked einsums instead of per-sample hooks.
"""

from .pipeline import (
    CalibContext,
    accumulate_hessian,
    capture_layer0,
    layer_taps,
    run_layer,
)

__all__ = [
    "CalibContext", "capture_layer0", "run_layer", "layer_taps",
    "accumulate_hessian",
]
