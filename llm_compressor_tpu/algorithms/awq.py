"""AWQ — activation-aware weight scaling + per-group weight clipping.

Reference: llm_compressor/quantization/calibrations/awq/{core.py:26-158,
auto_scale.py:23-353, auto_clip.py:15-101}. Per layer:

1. capture each linear's input activations (input_feat)
2. propagate layer outputs with ORIGINAL weights (core.py:111-113)
3. scale search: 20-point grid over s = mean|x|^ratio (normalized), loss =
   MSE of the inspected module's output with weights quantized as W*s -> /s
4. clip search: per-(row, group) grid over shrunken absmax, loss measured
   against partial products x.w per group (auto_clip.py:16-66)
5. apply scale (into the preceding norm or linear) + clip, then RTN

The per-arch scale-pair maps mirror auto_scale.py:145-310 exactly,
including the OPT-350M special case and the missing Gemma-1 map (raises).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..capture.pipeline import CalibContext, advance, layer_taps
from ..models.config import ModelConfig
from ..models.transformer import (
    LayerOps,
    arch_slots,
    attention,
    decoder_layer,
    layer_ops,
    make_causal_mask,
    mlp,
    rope_for_layer,
)
from ..qformats.config import QuantConfig
from ..qformats.quantize import quantize_dequant
from .common import get_bias, get_weight, set_bias, set_weight, slot_tap, weight_quantizer_for
from .rtn import rtn


@dataclass(frozen=True)
class ScalePair:
    prev_kind: str          # "norm" | "fc"
    prev_key: str           # norm param key or fc slot
    slots: Tuple[str, ...]  # linears receiving the column scale
    tap: str                # input_feat key
    inspect: str            # "attn" | "mlp" | "layer" | "linear"


def scale_pairs(cfg: ModelConfig, lp) -> List[ScalePair]:
    a = cfg.arch
    if a == "opt":
        if cfg.project_in_dim is not None:  # OPT-350M
            return [ScalePair("fc", "v", ("o",), "o_in", "linear")]
        return [
            ScalePair("norm", "ln1", ("q", "k", "v"), "attn_in", "attn"),
            ScalePair("fc", "v", ("o",), "o_in", "linear"),
            ScalePair("norm", "ln2", ("fc1",), "mlp_in", "linear"),
        ]
    if a == "bloom":
        return [
            ScalePair("norm", "ln1", ("qkv",), "attn_in", "layer"),
            ScalePair("norm", "ln2", ("fc1",), "mlp_in", "layer"),
        ]
    if a in ("llama", "qwen2", "qwen3"):
        pairs = [ScalePair("norm", "ln1", ("q", "k", "v"), "attn_in", "attn")]
        if get_weight(lp, "v").shape == get_weight(lp, "o").shape:
            pairs.append(ScalePair("fc", "v", ("o",), "o_in", "linear"))
        pairs.append(ScalePair("norm", "ln2", ("gate", "up"), "mlp_in", "mlp"))
        pairs.append(ScalePair("fc", "up", ("down",), "down_in", "linear"))
        return pairs
    if a == "phi":
        return [
            ScalePair("norm", "ln1", ("q", "k", "v"), "attn_in", "attn"),
            ScalePair("fc", "v", ("o",), "o_in", "linear"),
            ScalePair("fc", "o", ("fc1",), "mlp_in", "linear"),
        ]
    if a in ("gemma2", "gemma3"):
        pairs = []
        if get_weight(lp, "v").shape == get_weight(lp, "o").shape:
            pairs.append(ScalePair("fc", "v", ("o",), "o_in", "linear"))
        pairs.append(ScalePair("fc", "up", ("down",), "down_in", "linear"))
        return pairs
    raise NotImplementedError(
        f"AWQ scale map not defined for arch {a!r} (reference auto_scale.py:145-310)"
    )


# ---------------------------------------------------------------------------
# Module-output evaluation for the scale search
# ---------------------------------------------------------------------------


def _inspect_out(cfg, lp, ops, inspect: str, slot0: str, x, cos, sin, mask):
    if inspect == "attn":
        return attention(lp, cfg, x, cos, sin, mask, ops)
    if inspect == "mlp":
        return mlp(lp, cfg, x, ops)
    if inspect == "layer":
        return decoder_layer(lp, cfg, x, cos, sin, mask, ops)
    # single linear
    from ..models.layers import qlinear

    op = ops.get(slot0) if ops is not None else None
    return qlinear(x, get_weight(lp, slot0), get_bias(lp, slot0), op)


def _with_scaled_weights(lp, cfg: ModelConfig, slots, scales, quantizers):
    """Copy of layer params with W -> quantize(W * s) / s for the slots."""
    new = jax.tree_util.tree_map(lambda x: x, lp)
    for slot in slots:
        W = get_weight(new, slot)
        Ws = W.astype(jnp.float32) * scales[None, :]
        q = quantizers[slot]
        if q.qtype != "dummy":
            Ws = quantize_dequant(q, Ws)
        set_weight(new, slot, (Ws / scales[None, :]).astype(W.dtype))
    return new


def _search_scale(cfg, lp, ops, pair: ScalePair, x, cos, sin, mask, quantizers,
                  n_grid: int = 20):
    """Grid search the per-channel scale (reference auto_scale.py:71-125)."""
    x32 = x.astype(jnp.float32)
    x_mean = jnp.mean(jnp.abs(x32.reshape(-1, x32.shape[-1])), axis=0)

    org_out = _inspect_out(cfg, lp, ops, pair.inspect, pair.slots[0], x, cos, sin, mask)

    best_loss, best_scales = jnp.inf, None
    for r in range(n_grid):
        ratio = r / n_grid
        s = jnp.clip(x_mean**ratio, 1e-4, None)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        lp_s = _with_scaled_weights(lp, cfg, pair.slots, s, quantizers)
        out = _inspect_out(cfg, lp_s, ops, pair.inspect, pair.slots[0], x, cos, sin, mask)
        loss = float(jnp.mean((org_out.astype(jnp.float32) - out.astype(jnp.float32)) ** 2))
        if loss < best_loss:
            best_loss, best_scales = loss, s
    return best_scales


def _apply_scale(lp, cfg: ModelConfig, pair: ScalePair, scales):
    """Fold the scale into the graph (reference auto_scale.py:29-65)."""
    if pair.prev_kind == "norm":
        norm = lp[pair.prev_key]
        norm["weight"] = (norm["weight"].astype(jnp.float32) / scales).astype(norm["weight"].dtype)
        if "bias" in norm and norm["bias"] is not None:
            norm["bias"] = (norm["bias"].astype(jnp.float32) / scales).astype(norm["bias"].dtype)
    else:  # fc -> fc: divide the last len(scales) output rows of the prev fc
        Wp = get_weight(lp, pair.prev_key)
        n = scales.shape[0]
        Wp32 = Wp.astype(jnp.float32)
        Wp32 = Wp32.at[-n:].divide(scales[:, None])
        set_weight(lp, pair.prev_key, Wp32.astype(Wp.dtype))
        bp = get_bias(lp, pair.prev_key)
        if bp is not None:
            set_bias(lp, pair.prev_key, (bp.astype(jnp.float32) / scales).astype(bp.dtype))
    for slot in pair.slots:
        W = get_weight(lp, slot)
        set_weight(lp, slot, (W.astype(jnp.float32) * scales[None, :]).astype(W.dtype))


# ---------------------------------------------------------------------------
# Clip search (reference auto_clip.py:15-66)
# ---------------------------------------------------------------------------

CLIP_SKIP_SUBSTRINGS = ("q", "k", "qkv")  # q_/k_/query/key/Wqkv rule by slot


def _clip_skip(slot: str) -> bool:
    return slot in ("q", "k", "qkv")


@partial(jax.jit, static_argnames=("quantizer", "n_grid", "max_shrink"))
def _clip_search_chunk(w, xg, *, quantizer, n_grid=20, max_shrink=0.5):
    """w: (oc, n_g, g); xg: (T', n_g, g). Returns best max per (oc, n_g)."""
    w32 = w.astype(jnp.float32)
    x32 = xg.astype(jnp.float32)
    org_max = jnp.max(jnp.abs(w32), axis=-1, keepdims=True)  # (oc, n_g, 1)
    org_out = jnp.einsum("tgc,ogc->otg", x32, w32)

    def body(i_s, carry):
        best_max, min_err = carry
        mv = org_max * (1.0 - i_s.astype(jnp.float32) / n_grid)
        cur_w = jnp.clip(w32, -mv, mv)
        q_w = quantize_dequant(quantizer, cur_w)
        cur_out = jnp.einsum("tgc,ogc->otg", x32, q_w)
        err = jnp.mean((cur_out - org_out) ** 2, axis=1)[:, :, None]  # (oc, n_g, 1)
        take = err < min_err
        return jnp.where(take, mv, best_max), jnp.where(take, err, min_err)

    best_max, _ = jax.lax.fori_loop(
        0, int(max_shrink * n_grid), body,
        (org_max, jnp.full_like(org_max, jnp.inf)),
    )
    return best_max[..., 0]


def _auto_clip(lp, cfg, qcfg, layer_idx, slot, inp, mse, n_sample_token=512,
               oc_chunk=256):
    q = weight_quantizer_for(cfg, qcfg, layer_idx, slot, False)
    gs = q.group_size
    if q.qtype == "dummy" or gs in (0, -1, -2):
        return None
    W = get_weight(lp, slot)
    O, C = W.shape
    g = gs
    x = inp.reshape(-1, C)
    stride = max(1, x.shape[0] // n_sample_token)
    x = x[::stride]
    xg = x.reshape(x.shape[0], C // g, g)
    wg = W.reshape(O, C // g, g)
    outs = []
    step = oc_chunk if O % oc_chunk == 0 else O
    for i in range(0, O, step):
        outs.append(_clip_search_chunk(wg[i : i + step], xg, quantizer=q))
    return jnp.concatenate(outs, 0)  # (O, n_g)


def _apply_clip(lp, slot, best_max):
    W = get_weight(lp, slot)
    O, C = W.shape
    n_g = best_max.shape[1]
    g = C // n_g
    Wg = W.astype(jnp.float32).reshape(O, n_g, g)
    Wg = jnp.clip(Wg, -best_max[..., None], best_max[..., None])
    set_weight(lp, slot, Wg.reshape(O, C).astype(W.dtype))


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def awq(params, cfg: ModelConfig, ctx: CalibContext, qcfg: QuantConfig,
        mse: bool = False, do_clip: bool = True, finish_rtn: bool = True,
        scale_book: dict = None, verbose: bool = True) -> None:
    for i, lp in enumerate(params["layers"]):
        ops = layer_ops(cfg, qcfg, i)
        pairs = scale_pairs(cfg, lp)
        tap_keys = tuple(dict.fromkeys(
            [p.tap for p in pairs] + [slot_tap(s) for s in arch_slots(cfg)]
        ))
        feats = layer_taps(ctx, lp, i, ops, tap_keys)
        # propagate with ORIGINAL weights before mutating (core.py:111-113)
        advance(ctx, lp, i, ops)

        pos = ctx.positions[: min(ctx.chunk, ctx.positions.shape[0])]
        quantizers = {s: weight_quantizer_for(cfg, qcfg, i, s, False)
                      for s in arch_slots(cfg)}

        feat_scaled = dict(feats)
        for pair in pairs:
            x = feat_scaled[pair.tap]
            p = ctx.positions[: x.shape[0]]
            cos, sin = rope_for_layer(cfg, i, p)
            mask = make_causal_mask(cfg, i, p, p)
            s = _search_scale(cfg, lp, ops, pair, x, cos, sin, mask, quantizers)
            _apply_scale(lp, cfg, pair, s)
            # divide the scaled linears' cached inputs (core apply_scale
            # input_feat_dict handling, auto_scale.py:344-347)
            for slot in pair.slots:
                t = slot_tap(slot)
                feat_scaled[t] = (feat_scaled[t].astype(jnp.float32) / s).astype(feat_scaled[t].dtype)

        if do_clip:
            for slot in arch_slots(cfg):
                if _clip_skip(slot):
                    continue
                best = _auto_clip(lp, cfg, qcfg, i, slot, feat_scaled[slot_tap(slot)], mse)
                if best is not None:
                    _apply_clip(lp, slot, best)

    if finish_rtn:
        rtn(params, cfg, qcfg, mse=mse, scale_book=scale_book, verbose=False)


def awq_plus(params, cfg: ModelConfig, ctx: CalibContext, gptq_ctx: CalibContext,
             qcfg: QuantConfig, mse: bool = False, scale_book: dict = None,
             verbose: bool = True) -> None:
    """AWQ+ — AWQ scale/clip followed by GPTQ instead of RTN
    (reference awq_plus/core.py:26-160). ``gptq_ctx`` carries a fresh
    wikitext-2 capture for the GPTQ stage."""
    from .gptq import gptq

    awq(params, cfg, ctx, qcfg, mse=mse, finish_rtn=False, verbose=verbose)
    gptq(params, cfg, gptq_ctx, qcfg, mse=mse, scale_book=scale_book, verbose=verbose)
