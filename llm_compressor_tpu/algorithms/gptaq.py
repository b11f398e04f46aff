"""GPTAQ — GPTQ with asymmetric-error correction.

Reference: llm_compressor/quantization/calibrations/gptaq/core.py:24-335.
A second, full-precision activation stream (propagated through the ORIGINAL
unquantized layers, gptaq/core.py:96-99) provides the cross-term
dXXT = 2/n * sum (x_fp - x) x^T; the OBS update adds the correction
P = alpha * triu(dXXT @ Hinv^T, 1) @ Hinv to every propagation step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..capture.pipeline import CalibContext, run_layer, advance
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
from .obs import gptaq_update_with_params


@jax.jit
def _cross_chunk(x, fx):
    """(sum (fp-x) x^T, sum x x^T) over tokens of a (B, T, C) chunk."""
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    f2 = fx.reshape(-1, fx.shape[-1]).astype(jnp.float32)
    with jax.default_matmul_precision("highest"):
        return (f2 - x2).T @ x2, x2.T @ x2


def gptaq(params, cfg: ModelConfig, ctx: CalibContext, qcfg: QuantConfig,
          mse: bool = False, blocksize: int = 128, actorder: bool = True,
          alpha: float = 0.25, scale_book: dict = None,
          verbose: bool = True) -> None:
    # Second stream: full-precision inputs propagated through original layers
    fp_hidden = ctx.hidden
    n_samples = ctx.hidden.shape[0]

    for i, lp in enumerate(params["layers"]):
        ops = layer_ops(cfg, qcfg, i)
        # snapshot original layer params (pre-update) for the fp stream
        orig_lp = jax.tree_util.tree_map(lambda x: x, lp)

        # fp pass: cache fp tap inputs per chunk (original weights)
        fp_ctx = CalibContext(cfg=cfg, hidden=fp_hidden, positions=ctx.positions,
                              chunk=ctx.chunk)

        for group in sequential_groups(cfg):
            tap = slot_tap(group[0])
            H = None
            dXXT = None
            q_stream = run_layer(ctx, lp, i, ops, (tap,))
            fp_stream = run_layer(fp_ctx, orig_lp, i, ops, (tap,))
            for (s, e, _, taps_q), (_, _, _, taps_fp) in zip(q_stream, fp_stream):
                d, h = _cross_chunk(taps_q[tap], taps_fp[tap])
                H = h if H is None else H + h
                dXXT = d if dXXT is None else dXXT + d
            H = 2.0 * H / n_samples
            dXXT = 2.0 * dXXT / n_samples
            for slot in group:
                qz = weight_quantizer_for(cfg, qcfg, i, slot, mse)
                if qz.qtype == "dummy":
                    continue
                W = get_weight(lp, slot)
                Q, s, z = gptaq_update_with_params(W, H, dXXT, qz,
                                                   blocksize=blocksize,
                                                   actorder=actorder, alpha=alpha)
                set_weight(lp, slot, Q.astype(W.dtype))
                if scale_book is not None:
                    scale_book[(i, slot)] = (s, z)

        # propagate both streams
        advance(fp_ctx, orig_lp, i, ops)
        fp_hidden = fp_ctx.hidden
        advance(ctx, lp, i, ops)
    quantize_head_weight(params, qcfg, mse)
