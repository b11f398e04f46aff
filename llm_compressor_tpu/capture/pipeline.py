"""Layerwise calibration driver: capture, chunked layer execution, stats.

Replaces the reference's single-sample hook loops (gptq/core.py:82-146 runs
``layer(inps[j])`` 128 times per sequential group) with batched, jitted
chunk processing: the layer function is traced ONCE (static LayerOps are
equal across layers) and each chunk of calibration samples flows through as
one XLA program — Hessian accumulation is an einsum over all tokens in the
chunk, not a Python loop.

Hessian normalization matches the reference exactly
(gptq/core.py:114-119): H = (2 / n_samples) * sum_tokens x x^T, where
n_samples counts *samples* (sequences), not tokens.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.transformer import (
    LayerOps,
    decoder_layer,
    embed,
    make_causal_mask,
    rope_for_layer,
)

TAP_KEYS = ("attn_in", "o_in", "mlp_in", "down_in")

# Which tap feeds which linear slot (per arch family).
SLOT_TAP = {
    "q": "attn_in", "k": "attn_in", "v": "attn_in", "qkv": "attn_in",
    "o": "o_in",
    "gate": "mlp_in", "up": "mlp_in", "fc1": "mlp_in",
    "down": "down_in", "fc2": "down_in",
}


@dataclass
class CalibContext:
    """Per-run calibration state: current layer inputs + positional data."""

    cfg: ModelConfig
    hidden: jnp.ndarray        # (N, T, hidden) inputs to the current layer
    positions: jnp.ndarray     # (N, T)
    chunk: int = 8             # samples per jitted step

    def chunks(self):
        n = self.hidden.shape[0]
        for s in range(0, n, self.chunk):
            yield s, min(s + self.chunk, n)


def capture_layer0(params, cfg: ModelConfig, tokens: jnp.ndarray, chunk: int = 8) -> CalibContext:
    """Run the embedding front-end to produce layer-0 inputs (the reference's
    Catcher, reference gptq/core.py:54-77, without the exception hack)."""
    N, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (N, T))
    emb_fn = jax.jit(partial(embed, cfg=cfg))
    outs = [emb_fn(params, tokens=tokens[s:e], positions=positions[s:e])
            for s, e in _ranges(N, chunk)]
    return CalibContext(cfg=cfg, hidden=jnp.concatenate(outs, 0),
                        positions=positions, chunk=chunk)


def _ranges(n, chunk):
    return [(s, min(s + chunk, n)) for s in range(0, n, chunk)]


@partial(jax.jit, static_argnames=("cfg", "ops", "tap_keys"))
def _layer_step(layer_params, x, cos, sin, mask, *, cfg, ops, tap_keys):
    taps: dict = {}
    y = decoder_layer(layer_params, cfg, x, cos, sin, mask, ops, taps)
    return y, {k: taps[k] for k in tap_keys if k in taps}


def run_layer(
    ctx: CalibContext,
    layer_params,
    layer_idx: int,
    ops: Optional[LayerOps] = None,
    tap_keys: Tuple[str, ...] = (),
):
    """Yield (start, end, out_chunk, taps_chunk) for each calibration chunk.

    The caller accumulates statistics from ``taps_chunk`` and may write the
    outputs back via :func:`advance`.
    """
    cfg = ctx.cfg
    for s, e in ctx.chunks():
        pos = ctx.positions[s:e]
        cos, sin = rope_for_layer(cfg, layer_idx, pos)
        mask = make_causal_mask(cfg, layer_idx, pos, pos)
        y, taps = _layer_step(layer_params, ctx.hidden[s:e], cos, sin, mask,
                              cfg=cfg, ops=ops, tap_keys=tuple(tap_keys))
        yield s, e, y, taps


def advance(ctx: CalibContext, layer_params, layer_idx: int,
            ops: Optional[LayerOps] = None) -> None:
    """Propagate ctx.hidden through the (already updated) layer in place."""
    outs = []
    for _, _, y, _ in run_layer(ctx, layer_params, layer_idx, ops):
        outs.append(y)
    ctx.hidden = jnp.concatenate(outs, 0)


def layer_taps(ctx: CalibContext, layer_params, layer_idx: int,
               ops: Optional[LayerOps] = None,
               tap_keys: Tuple[str, ...] = TAP_KEYS) -> Dict[str, jnp.ndarray]:
    """Materialize all tap activations for one layer (concatenated over
    samples). Used by AWQ/SmoothQuant which need the full input_feat."""
    acc: Dict[str, list] = {k: [] for k in tap_keys}
    for _, _, _, taps in run_layer(ctx, layer_params, layer_idx, ops, tap_keys):
        for k, v in taps.items():
            acc[k].append(v)
    return {k: jnp.concatenate(v, 0) for k, v in acc.items() if v}


@jax.jit
def _hessian_chunk(x):
    """sum over tokens of x x^T for a (B, T, C) activation chunk.

    Full-f32 precision: on TPU the MXU would otherwise run f32 matmuls as
    bf16 passes, which visibly degrades Hessian conditioning."""
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    with jax.default_matmul_precision("highest"):
        return jnp.einsum("tc,td->cd", x2, x2)


def accumulate_hessian(
    ctx: CalibContext,
    layer_params,
    layer_idx: int,
    tap_keys: Tuple[str, ...],
    ops: Optional[LayerOps] = None,
    collect_outputs: bool = False,
):
    """One pass over the calibration set accumulating, per tap key:
    H = (2 / n_samples) * sum_tokens x x^T  (reference gptq/core.py:114-119).

    Returns (hessians: {tap: (C, C) f32}, outs or None).
    """
    n_samples = ctx.hidden.shape[0]
    H: Dict[str, jnp.ndarray] = {}
    outs = [] if collect_outputs else None
    for s, e, y, taps in run_layer(ctx, layer_params, layer_idx, ops, tap_keys):
        for k, x in taps.items():
            h = _hessian_chunk(x)
            H[k] = h if k not in H else H[k] + h
        if collect_outputs:
            outs.append(y)
    H = {k: 2.0 * v / n_samples for k, v in H.items()}
    if collect_outputs:
        outs = jnp.concatenate(outs, 0)
    return H, outs


@jax.jit
def _sqnorm_chunk(x):
    """sum over tokens of x_c^2 per channel for a (B, T, C) chunk."""
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    return jnp.sum(x2 * x2, axis=0)


def accumulate_scaler_rows(
    ctx: CalibContext,
    layer_params,
    layer_idx: int,
    tap_keys: Tuple[str, ...],
    ops: Optional[LayerOps] = None,
):
    """Wanda/RIA channel statistic: mean over *samples* of ||x_c||^2
    (reference wanda/core.py:92-113 — the running-mean over hook calls with
    one sample per call reduces to sum_tokens(x_c^2) / n_samples)."""
    n_samples = ctx.hidden.shape[0]
    acc: Dict[str, jnp.ndarray] = {}
    for s, e, y, taps in run_layer(ctx, layer_params, layer_idx, ops, tap_keys):
        for k, x in taps.items():
            v = _sqnorm_chunk(x)
            acc[k] = v if k not in acc else acc[k] + v
    return {k: v / n_samples for k, v in acc.items()}
