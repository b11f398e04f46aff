"""engine — serving: KV cache (optionally quantized), prefill/decode,
generation loop, sharded execution.

The reference's generation loop re-encodes a sliding window every step with
no KV reuse (models/base.py:285-322); this engine is the TPU-native upgrade
the north star demands: jitted prefill + single-token decode over a real
(quantizable) KV cache, mesh-shardable.
"""

from .batching import ContinuousBatcher, Request
from .kvcache import KVCache, init_cache
from .generate import (generate, generate_text, prefill, decode_step,
                       decode_greedy_steps)
from .speculative import decode_verify_step, generate_speculative

__all__ = ["KVCache", "init_cache", "generate", "generate_text", "prefill",
           "decode_step", "decode_greedy_steps", "ContinuousBatcher",
           "Request", "decode_verify_step", "generate_speculative"]
