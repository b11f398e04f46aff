"""algorithms — calibration (RTN/SmoothQuant/GPTQ/AWQ/AWQ+/GPTAQ/SpinQuant)
and pruning (Magnitude/Wanda/SparseGPT/RIA), as pure functions over params.

Each algorithm mirrors the reference semantics exactly (SURVEY.md §2.3-2.4)
while replacing hook-based capture with the functional taps pipeline and
per-sample loops with batched jitted einsums/scans.
"""

from .awq import awq, awq_plus
from .gptaq import gptaq
from .gptq import gptq
from .magnitude import magnitude
from .obs import gptaq_update, gptq_update, sparsegpt_update
from .pack import pack_model
from .ria import ria
from .rtn import rtn
from .smoothquant import smoothquant
from .sparsegpt import sparsegpt
from .spinquant import spinquant
from .wanda import wanda

__all__ = [
    "rtn", "smoothquant", "gptq", "awq", "awq_plus", "gptaq", "spinquant",
    "magnitude", "wanda", "sparsegpt", "ria",
    "gptq_update", "gptaq_update", "sparsegpt_update", "pack_model",
]
