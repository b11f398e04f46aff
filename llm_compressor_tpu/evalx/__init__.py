"""evalx — perplexity evaluation, sparsity check, per-op profiling.

TPU re-design of the reference evaluation stack (SURVEY.md §2.6, §5.1).
"""

from .mpq import read_stats, select_ops, sqnr_driven_mpq
from .ppl import compute_ppl, evaluate
from .profiler import profile_model
from .sparsity import check_sparsity

__all__ = ["compute_ppl", "evaluate", "check_sparsity", "profile_model",
           "read_stats", "select_ops", "sqnr_driven_mpq"]
