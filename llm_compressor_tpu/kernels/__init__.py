"""kernels — Pallas TPU kernels for the quantized execution hot path.

Each kernel ships with an XLA reference implementation used for numerics
tests and as a fallback on unsupported shapes/platforms.
"""

from .dequant_matmul import dequant_matmul, dequant_matmul_xla
from .hadamard import hadamard_transform, hadamard_transform_pallas
from .w4a8_matmul import w4a8_matmul

__all__ = ["dequant_matmul", "dequant_matmul_xla", "w4a8_matmul",
           "hadamard_transform", "hadamard_transform_pallas"]
