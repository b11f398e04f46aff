"""Fused int8-KV decode attention — Pallas kernel with fresh-block support.

Round-4 re-promotion of the archived kernel (benchmarks/
pallas_decode_attention.py, removed in round 3 after an A/B measured ~5%
behind the XLA int8-codes path). Two things changed:

1. The round-3 A/B was contaminated by the ~25 ms/dispatch tunnel RTT
   (experiments/exp_dispatch_const.py). RTT-corrected, the kernel ties the
   SINGLE-window XLA path at ~stream rate (~590 GB/s at b128/S256).
2. The serving decode path is no longer single-window: the fresh-block
   scan attends over [read-only main cache | FreshKV block], and the
   cross-part max/sum coupling of the two-part softmax breaks XLA's
   fusion — every fresh-structure XLA variant measured ~300 GB/s vs ~590
   single-window (benchmarks/bench_attention_fresh.py: fresh2/fresh2sw/
   fresh2bf16/freshcat all ~2x slower; the score arrays round-trip HBM
   once per coupled reduction). Inside one Pallas program the scores
   live in VMEM, so the two-part epilogue costs nothing extra.

Math: identical to engine.generate's int8-codes attention with the slim
epilogue (_i8_softmax_requant): per-row int8 quant of q, int8 x int8 MXU
dots on the stored codes, exact two-pass softmax with the normalization
folded into the output scale:

    e_p  = exp(s_p - m),  m = max over all parts
    w_p  = e_p * v_scale_p
    a    = max(max_p w_p) / 127          (clamped at 1e-8)
    pi_p = round(w_p / a)  in int8
    out  = (sum_p pi_p . V_p) * a / sum_p(sum(e_p))

Layout (engine/kvcache.py): main codes (L, B, KV, D, S) int8, sequence on
the LANE dim; scales (L, B, KV, 1, S) f32; fresh block codes
(L, B, KV, W, D) — step on SUBLANES (round 5), so the per-step write is a
lane-full sublane slab — with scales (L, B, KV, 1, W).
The layer index, per-slot lengths/window-positions, window size and scan
step ride as scalar prefetch — the kernel DMAs straight out of the full
cache buffers (no per-layer slice copy) and one compiled kernel serves
every layer and step of the decode scan.

Grid: (B/TB,) — one program streams a (TB, KV, D, S) block (the natural
cache-layout slice, one dense DMA) and runs each slot's KV heads as
KV-batched MXU dots in VMEM. A (B, KV) grid (round 2) paid ~0.9 ms/layer
in per-program overheads; TB adapts to the VMEM budget.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# Latched ONCE at import (see supported()): jit caches key on static args,
# so a mid-process env flip would be silently ignored by compiled code.
_FUSED_ATTN_OPTIN = bool(os.environ.get("LLMC_FUSED_ATTN"))


def _row_quant_i8(x):
    """(KV, r, S) f32 -> int8 codes + per-row scale. Restrictive range
    +-127, round-half-even (qformats int8 semantics)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _slot_attention(q, parts, *, scale, softcap, qi=None, qs=None):
    """One slot, all KV heads. ``parts`` = [(k, v, ks, vs, keep, sub), ...]
    with ks/vs (KV, 1, Sp) f32, keep (1, 1, Sp) bool and ``sub`` the
    layout flag: sub=False -> k/v (KV, D, Sp) (main cache, sequence on
    lanes); sub=True -> k/v (KV, Sp, D) (FreshKV, sequence on SUBLANES —
    the round-5 layout whose per-step write is a lane-full sublane slab).
    Returns (KV, r, D) f32. Slim epilogue == _i8_softmax_requant.
    ``qi``/``qs`` may be passed pre-quantized (fused-append kernel)."""
    if qi is None:
        qi, qs = _row_quant_i8(q)                   # (KV, r, D) int8

    ss = []
    for (k, _v, ks, _vs, keep, sub) in parts:
        s32 = jax.lax.dot_general(                  # (KV, r, Sp) int8 MXU
            qi, k,
            dimension_numbers=(((2,), (2 if sub else 1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qs * ks * scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        ss.append(jnp.where(keep, s, NEG_INF))

    m = ss[0].max(axis=-1, keepdims=True)
    for s in ss[1:]:
        m = jnp.maximum(m, s.max(axis=-1, keepdims=True))
    es = [jnp.exp(s - m) for s in ss]
    sum_row = es[0].sum(axis=-1, keepdims=True)
    for e in es[1:]:
        sum_row = sum_row + e.sum(axis=-1, keepdims=True)
    ws = [e * vs for e, (_k, _v, _ks, vs, _keep, _sub) in zip(es, parts)]
    a = ws[0].max(axis=-1, keepdims=True)
    for w in ws[1:]:
        a = jnp.maximum(a, w.max(axis=-1, keepdims=True))
    a = jnp.maximum(a / 127.0, 1e-8)

    o32 = None
    for w, (_k, v, _ks, _vs, _keep, sub) in zip(ws, parts):
        pi = jnp.clip(jnp.round(w / a), -127, 127).astype(jnp.int8)
        d = jax.lax.dot_general(                    # (KV, r, D) int8 MXU
            pi, v,
            dimension_numbers=(((2,), (1 if sub else 2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        o32 = d if o32 is None else o32 + d
    return o32.astype(jnp.float32) * (a / sum_row)


def _kernel(layer_ref, mlen_ref, pos_ref, wt_ref, q_ref, k_ref, v_ref,
            ks_ref, vs_ref, *rest, tb: int, scale: float, softcap,
            has_fresh: bool):
    """wt_ref (2,) = [window, t]; ``rest`` = (*fresh_refs, o_ref) — the
    four fresh refs precede the output ref when has_fresh."""
    o_ref = rest[-1]
    i = pl.program_id(0)
    w = wt_ref[0]
    t = wt_ref[1]
    if has_fresh:
        kf_ref, vf_ref, ksf_ref, vsf_ref = rest[:-1]
        W = kf_ref.shape[-2]                        # codes (.., W, D)
    S = k_ref.shape[-1]

    for sl in range(tb):
        b = i * tb + sl
        mlen = mlen_ref[b]
        pos = pos_ref[b]
        s_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        keep_m = (s_ids < mlen) & ((w <= 0) | (s_ids > pos - w))
        parts = [(k_ref[0, sl], v_ref[0, sl], ks_ref[0, sl], vs_ref[0, sl],
                  keep_m, False)]
        if has_fresh:
            f_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
            base = mlen  # fresh step j sits at absolute position mlen + j
            keep_f = (f_ids <= t) & ((w <= 0) | ((base + f_ids) > pos - w))
            parts.append((kf_ref[0, sl], vf_ref[0, sl], ksf_ref[0, sl],
                          vsf_ref[0, sl], keep_f, True))
        out = _slot_attention(q_ref[sl].astype(jnp.float32), parts,
                              scale=scale, softcap=softcap)
        o_ref[sl] = out.astype(o_ref.dtype)


def _kernel_stats(layer_ref, mlen_ref, pos_ref, w_ref, qi_ref, qs_ref,
                  mf_ref, wfm_ref, k_ref, v_ref, ks_ref, vs_ref,
                  o_ref, m_ref, a_ref, sum_ref, *, tb: int, scale: float,
                  softcap):
    """MAIN-window partial attention with cross-part quant coupling.

    The hybrid fresh-decode design (round 4): any custom call that READS
    a buffer some XLA op WRITES inside the decode scan makes XLA
    copy-protect the whole buffer (~0.5 ms/layer for FreshKV, whichever
    side writes first — benchmarks/bench_attention_fresh.py
    pallas2_write / pallas4_wafter), and in-kernel aliased writes
    serialize the Mosaic pipeline. So the kernel touches ONLY the
    loop-INVARIANT main cache; the (B, KV, r, W) fresh side runs in XLA
    where its DUS + reads fuse freely. The int8 prob quantizer couples
    the parts through the shared row scale ``a``, so the fresh side runs
    FIRST and hands in per-row stats:

        m_f    = rowmax of the masked fresh scores
        wfm'   = rowmax of exp(s_f - m_f) * v_scale_f

    and the kernel finishes the coupling exactly:

        m   = max(m_main, m_f)
        a   = max(wmax_main, wfm' * exp(m_f - m)) / 127   (clamped)
        pi  = round(w_main / a);  o32 = pi . V_main
        out = o32 as f32 (exact only while 127^2 * S < 2^24, i.e.
              S < 1040; larger windows round the int32 partial sums at
              ~1e-7 relative — inside the documented ulp-class tolerance
              of the two-part epilogue), plus (m, a, sum_main)

    XLA then requantizes the fresh probs with the SAME (m, a), adds the
    fresh PV dot, and scales by a / (sum_main + sum_f' * exp(m_f - m)).
    ``qi``/``qs`` (the row-quantized q) are computed once in XLA and fed
    to both sides."""
    i = pl.program_id(0)
    w = w_ref[0]
    S = k_ref.shape[-1]

    for sl in range(tb):
        b = i * tb + sl
        mlen = mlen_ref[b]
        pos = pos_ref[b]
        qi = qi_ref[sl]                                 # (KV, r, D) int8
        qs = qs_ref[sl].astype(jnp.float32)             # (KV, r, 1)
        s32 = jax.lax.dot_general(                      # (KV, r, S)
            qi, k_ref[0, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qs * ks_ref[0, sl] * scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        s_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        keep = (s_ids < mlen) & ((w <= 0) | (s_ids > pos - w))
        s = jnp.where(keep, s, NEG_INF)

        m_main = s.max(axis=-1, keepdims=True)          # (KV, r, 1)
        m = jnp.maximum(m_main, mf_ref[sl])
        e = jnp.exp(s - m)
        sum_m = e.sum(axis=-1, keepdims=True)
        wm = e * vs_ref[0, sl]
        a = jnp.maximum(wm.max(axis=-1, keepdims=True),
                        wfm_ref[sl] * jnp.exp(mf_ref[sl] - m))
        a = jnp.maximum(a / 127.0, 1e-8)
        pi = jnp.clip(jnp.round(wm / a), -127, 127).astype(jnp.int8)
        o32 = jax.lax.dot_general(                      # (KV, r, D)
            pi, v_ref[0, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        o_ref[sl] = o32.astype(jnp.float32)
        m_ref[sl] = m
        a_ref[sl] = a
        sum_ref[sl] = sum_m


@partial(jax.jit, static_argnames=("scale", "softcap"))
def _call_stats(layer, mlen, pos, w, qi, qs, mf, wfm, kc, vc, ks, vs, *,
                scale, softcap):
    B, KV, r, D = qi.shape
    S = kc.shape[-1]
    tb = _pick_tb(B, KV, D, S, 0)
    interpret = jax.default_backend() != "tpu"

    def blk_main(shape5):
        return pl.BlockSpec((1, tb) + shape5,
                            lambda i, l, *_: (l[0], i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def blk_row(dim3):
        return pl.BlockSpec((tb, KV, r, dim3), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # layer, mlen, pos, window
        grid=(B // tb,),
        in_specs=[blk_row(D), blk_row(1), blk_row(1), blk_row(1),
                  blk_main((KV, D, S)), blk_main((KV, D, S)),
                  blk_main((KV, 1, S)), blk_main((KV, 1, S))],
        out_specs=(blk_row(D), blk_row(1), blk_row(1), blk_row(1)),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((B, KV, r, D), jnp.float32),
        jax.ShapeDtypeStruct((B, KV, r, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, KV, r, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, KV, r, 1), jnp.float32),
    )
    return pl.pallas_call(
        partial(_kernel_stats, tb=tb, scale=scale, softcap=softcap),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KV * r * S * D,
            bytes_accessed=2 * B * KV * (D + 4) * S,
            transcendentals=B * KV * r * S,
        ),
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32).ravel(), mlen, pos,
      jnp.asarray([w], jnp.int32).ravel(), qi, qs, mf, wfm, kc, vc, ks, vs)


def decode_attention_stats(qi, qs, m_f, wfm, cache_k, cache_v, k_scale,
                           v_scale, layer, main_len, pos, window, *,
                           scale: float, softcap=None):
    """Main-window partial attention (see _kernel_stats): returns
    (o32_main as exact f32 (B, KV, r, D), m, a, sum_main each
    (B, KV, r, 1)). ``qi``/``qs`` from the XLA row quant; ``m_f``/``wfm``
    the fresh side's masked rowmax stats."""
    return _call_stats(jnp.asarray(layer, jnp.int32),
                       main_len.astype(jnp.int32), pos.astype(jnp.int32),
                       jnp.asarray(window, jnp.int32), qi,
                       qs.astype(jnp.float32), m_f, wfm,
                       cache_k, cache_v, k_scale, v_scale,
                       scale=float(scale),
                       softcap=None if softcap is None else float(softcap))


def _kernel_write(layer_ref, t_ref, kf_ref, vf_ref, ksf_ref, vsf_ref,
                  nk_ref, nv_ref, nks_ref, nvs_ref,
                  kfo_ref, vfo_ref, ksfo_ref, vsfo_ref):
    """Merge the new token's codes/scales at lane ``t`` of layer
    ``layer``'s fresh slice (single-program grid; outputs alias inputs).
    Mosaic cannot write a 1-lane block (lane blocks must be 128-divisible
    or full), so the whole (1, B, KV, D|1, W) layer slice is read, merged
    with a masked select, and written back (~9 MB r/w at the bench shape,
    ~14 us — vs ~260 us/layer of XLA copy-protection when a DUS-written
    buffer feeds an opaque custom call)."""
    t = t_ref[0]
    W = kf_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, W), 3)
    kfo_ref[0] = jnp.where(lane == t, nk_ref[...], kf_ref[0])
    vfo_ref[0] = jnp.where(lane == t, nv_ref[...], vf_ref[0])
    ksfo_ref[0] = jnp.where(lane == t, nks_ref[...], ksf_ref[0])
    vsfo_ref[0] = jnp.where(lane == t, nvs_ref[...], vsf_ref[0])


@jax.jit
def _call_write(layer, t, kf, vf, ksf, vsf, nk, nv, nks, nvs):
    L, B, KV, D, W = kf.shape
    interpret = jax.default_backend() != "tpu"

    def blk(dim3):
        # index maps receive (grid_idx, *scalar_refs)
        return pl.BlockSpec((1, B, KV, dim3, W),
                            lambda g, l, tt: (l[0], 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def blk_new(dim3):
        return pl.BlockSpec((B, KV, dim3, 1), lambda g, l, tt: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer, t
        grid=(1,),
        in_specs=[blk(D), blk(D), blk(1), blk(1),
                  blk_new(D), blk_new(D), blk_new(1), blk_new(1)],
        out_specs=(blk(D), blk(D), blk(1), blk(1)),
    )
    return pl.pallas_call(
        _kernel_write,
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                        for a in (kf, vf, ksf, vsf)),
        # flat-leaf indices including the 2 scalar operands: kf=2 .. vsf=5
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * 2 * B * KV * (D + 4) * W,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32).ravel(),
      jnp.asarray([t], jnp.int32).ravel(),
      kf, vf, ksf, vsf, nk, nv, nks, nvs)


def fresh_write(fresh, new_kv, layer, t):
    """In-place (aliased) write of one token's K/V into the FreshKV
    buffers at (layer, lane t). ``fresh`` = (kf, vf, ksf, vsf);
    ``new_kv`` = codes (B, KV, D, 1) int8 + scales (B, KV, 1, 1) f32.
    Returns the updated 4-tuple."""
    kf, vf, ksf, vsf = fresh
    nk, nv, nks, nvs = new_kv
    return _call_write(jnp.asarray(layer, jnp.int32),
                       jnp.asarray(t, jnp.int32), kf, vf, ksf, vsf,
                       nk, nv, nks, nvs)


def _kernel_append(layer_ref, mlen_ref, pos_ref, wt_ref, qi_ref, qs_ref,
                   k_ref, v_ref, ks_ref, vs_ref, kf_ref, vf_ref, ksf_ref,
                   vsf_ref, nkv_ref, nsc_ref, *out_refs,
                   tb: int, scale: float, softcap, merge_new: bool,
                   emit_fresh: bool, quant_q: bool):
    """FUSED-APPEND decode attention (round 5): one kernel computes the
    full [main | fresh+current] attention AND emits the updated fresh
    block as a FUNCTIONAL output (no aliasing).

    This is the design the round-4 layout blocked (docs/serving.md
    round-4 table): with FreshKV codes (L, B, KV, W, D) the new token is
    one lane-full sublane row, merged in-register with a select — the
    kernel never needs an aliased store (which serialized the Mosaic
    pipeline, 174 us/layer) and no XLA op ever writes a buffer this
    kernel reads (which made XLA copy-protect the fresh set,
    525 us/layer). The engine threads the (B, KV, W, D) outputs through
    the layer scan as ys, which stack to the next step's (L, ...) fresh
    carry — scan's native output pattern, no copy-protection.

    ``nkv`` (B, KV, 2, D) int8 carries the current token's [kc | vc]
    code rows; ``nsc`` (B, KV, 2, 8) f32 carries [ks | vs] broadcast
    over 8 lanes (a lane-safe scalar container: Mosaic cannot slice the
    lane dim, so the scalar is recovered with a max over equal lanes).
    ``merge_new=False`` is the bench "append" ablation: attend read-only
    and pass the fresh block through unchanged.

    ``emit_fresh=False`` is the round-5 DEFERRED-WRITE refinement: the
    kernel outputs ONLY the attention (the dissection measured the four
    fresh-block outputs at ~+43 us/layer and their ys stacking at ~+32,
    exp_append_dissect.py) — the engine already holds the token's rows
    in XLA, collects them as tiny ys, and performs ONE sublane-slab DUS
    into the fresh carry per STEP, after the layer scan. Moving the
    write out of the layer loop is what round 4's per-layer
    arrangements were missing; worst case XLA copy-protects the fresh
    set once per step (~9 MB, ~1 us/layer equivalent)."""
    i = pl.program_id(0)
    w = wt_ref[0]
    t = wt_ref[1]
    S = k_ref.shape[-1]
    W = kf_ref.shape[-2]
    if emit_fresh == "alias":
        # the 4 aliased accumulator INPUT refs precede the outputs in the
        # kernel arg order; they are write-only (never read here)
        out_refs = out_refs[4:]

    for sl in range(tb):
        b = i * tb + sl
        mlen = mlen_ref[b]
        pos = pos_ref[b]
        kf = kf_ref[0, sl]                           # (KV, W, D) int8
        vf = vf_ref[0, sl]
        ksf = ksf_ref[0, sl]                         # (KV, 1, W) f32
        vsf = vsf_ref[0, sl]
        if merge_new:
            nkv = nkv_ref[sl]                        # (KV, 2, D) int8
            nsc = nsc_ref[sl]                        # (KV, 2, 8) f32
            kc_new = nkv[:, 0, :]                    # (KV, D)
            vc_new = nkv[:, 1, :]
            ks_new = jnp.max(nsc[:, 0, :], axis=-1)  # (KV,)
            vs_new = jnp.max(nsc[:, 1, :], axis=-1)
            sub_ids = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
            kf = jnp.where(sub_ids == t, kc_new[:, None, :], kf)
            vf = jnp.where(sub_ids == t, vc_new[:, None, :], vf)
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
            ksf = jnp.where(lane_ids == t, ks_new[:, None, None], ksf)
            vsf = jnp.where(lane_ids == t, vs_new[:, None, None], vsf)

        s_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        keep_m = (s_ids < mlen) & ((w <= 0) | (s_ids > pos - w))
        f_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
        f_lim = f_ids <= t if merge_new else f_ids < t
        keep_f = f_lim & ((w <= 0) | ((mlen + f_ids) > pos - w))
        parts = [(k_ref[0, sl], v_ref[0, sl], ks_ref[0, sl], vs_ref[0, sl],
                  keep_m, False),
                 (kf, vf, ksf, vsf, keep_f, True)]
        if quant_q:
            # qi_ref holds the raw f32 q4; row-quant in-kernel (identical
            # _row_quant_i8 formula -> bitwise the XLA prologue's codes)
            out = _slot_attention(qi_ref[sl].astype(jnp.float32), parts,
                                  scale=scale, softcap=softcap)
        else:
            out = _slot_attention(None, parts, scale=scale, softcap=softcap,
                                  qi=qi_ref[sl],
                                  qs=qs_ref[sl].astype(jnp.float32))
        o_ref = out_refs[0]
        o_ref[sl] = out.astype(o_ref.dtype)
        if emit_fresh == "emit":
            kfo_ref, vfo_ref, ksfo_ref, vsfo_ref = out_refs[1:]
            kfo_ref[sl] = kf
            vfo_ref[sl] = vf
            ksfo_ref[sl] = ksf
            vsfo_ref[sl] = vsf
        elif emit_fresh == "alias":
            # write-only into the (L, ...) accumulator at this layer's
            # block (out_specs index on the prefetched layer) — the final
            # fresh lands at its destination with no ys copies; unvisited
            # layer blocks pass through via input_output_aliases
            kfo_ref, vfo_ref, ksfo_ref, vsfo_ref = out_refs[1:]
            kfo_ref[0, sl] = kf
            vfo_ref[0, sl] = vf
            ksfo_ref[0, sl] = ksf
            vsfo_ref[0, sl] = vsf


@partial(jax.jit, static_argnames=("scale", "softcap", "merge_new",
                                   "emit_fresh", "quant_q"))
def _call_append(layer, mlen, pos, wt, qi, qs, kc, vc, ks, vs,
                 kf, vf, ksf, vsf, nkv, nsc, acc=None, *, scale, softcap,
                 merge_new=True, emit_fresh="emit", quant_q=False):
    B, KV, r, D = qi.shape
    S = kc.shape[-1]
    W = kf.shape[-2]
    tb = _pick_tb(B, KV, D, S, W)
    interpret = jax.default_backend() != "tpu"

    def blk_l(shape3):
        return pl.BlockSpec((1, tb) + shape3,
                            lambda i, l, *_: (l[0], i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def blk_b(shape3):
        return pl.BlockSpec((tb,) + shape3, lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out_specs = (blk_b((KV, r, D)),)
    out_shapes = (jax.ShapeDtypeStruct((B, KV, r, D), jnp.float32),)
    extra_in = ()
    aliases = {}
    if emit_fresh == "emit":
        out_specs += (blk_b((KV, W, D)), blk_b((KV, W, D)),
                      blk_b((KV, 1, W)), blk_b((KV, 1, W)))
        out_shapes += (jax.ShapeDtypeStruct((B, KV, W, D), jnp.int8),
                       jax.ShapeDtypeStruct((B, KV, W, D), jnp.int8),
                       jax.ShapeDtypeStruct((B, KV, 1, W), jnp.float32),
                       jax.ShapeDtypeStruct((B, KV, 1, W), jnp.float32))
    elif emit_fresh == "alias":
        # the fresh accumulator (L, ...) rides as write-only aliased
        # in/out; this call's out blocks index the prefetched layer, all
        # other layer blocks pass through untouched
        out_specs += (blk_l((KV, W, D)), blk_l((KV, W, D)),
                      blk_l((KV, 1, W)), blk_l((KV, 1, W)))
        out_shapes += tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                            for a in acc)
        extra_in = tuple(acc)
        # flat operand indices incl. the 4 scalar-prefetch args: acc
        # leaves sit after nsc (index 15)
        aliases = {16: 1, 17: 2, 18: 3, 19: 4}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # layer, mlen, pos, [window, t]
        grid=(B // tb,),
        in_specs=[blk_b((KV, r, D)), blk_b((KV, r, 1)),
                  blk_l((KV, D, S)), blk_l((KV, D, S)),
                  blk_l((KV, 1, S)), blk_l((KV, 1, S)),
                  blk_l((KV, W, D)), blk_l((KV, W, D)),
                  blk_l((KV, 1, W)), blk_l((KV, 1, W)),
                  blk_b((KV, 2, D)), blk_b((KV, 2, 8))]
        + ([blk_l((KV, W, D)), blk_l((KV, W, D)),
            blk_l((KV, 1, W)), blk_l((KV, 1, W))]
           if emit_fresh == "alias" else []),
        out_specs=out_specs,
    )
    nbytes = (2 * B * KV * (D + 4) * S
              + (4 if emit_fresh != "none" else 2) * B * KV * (D + 4) * W)
    return pl.pallas_call(
        partial(_kernel_append, tb=tb, scale=scale, softcap=softcap,
                merge_new=merge_new, emit_fresh=emit_fresh,
                quant_q=quant_q),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KV * r * (S + W) * D,
            bytes_accessed=nbytes,
            transcendentals=B * KV * r * (S + W),
        ),
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32).ravel(), mlen, pos, wt,
      qi, qs, kc, vc, ks, vs, kf, vf, ksf, vsf, nkv, nsc, *extra_in)


def decode_attention_append(qi, qs, cache, fresh, new_kv, layer, main_len,
                            pos, window, t, *, scale: float, softcap=None,
                            merge_new: bool = True,
                            emit_fresh="emit",
                            quant_q: bool = False, acc=None):
    """Fused-append attention (see _kernel_append): returns
    (o32 (B, KV, r, D) f32, fresh') where fresh' depends on
    ``emit_fresh``:

    - "emit" (or True): layer ``layer``'s updated fresh slice tuple
      (kf', vf', ksf', vsf') — the engine stacks them as layer-scan ys.
    - "alias": the full (L, ...) accumulator tuple ``acc`` with this
      layer's block written in place (write-only input_output_aliases;
      the engine threads it through the layer scan as a carry — no ys
      copies, the fresh lands at its final location).
    - "none" (or False): None (deferred-write probe; measured-losing).

    ``qi``/``qs`` from the engine's XLA row quant (bitwise the XLA
    path's) — or ``qi`` = raw f32 q4 with ``quant_q`` (in-kernel quant).
    ``new_kv`` = (kc (B, KV, D, 1) int8, vc, ks (B, KV, 1, 1) f32, vs) —
    the current token exactly as write_fresh would store it."""
    if emit_fresh is True:
        emit_fresh = "emit"
    elif emit_fresh is False:
        emit_fresh = "none"
    kc, vc, ks, vs = new_kv
    B, KV, D, _ = kc.shape
    nkv = jnp.concatenate([kc.reshape(B, KV, 1, D),
                           vc.reshape(B, KV, 1, D)], axis=2)
    nsc = jnp.broadcast_to(
        jnp.concatenate([ks, vs], axis=2), (B, KV, 2, 8))
    wt = jnp.stack([jnp.asarray(window, jnp.int32).reshape(()),
                    jnp.asarray(t, jnp.int32).reshape(())])
    outs = _call_append(
        jnp.asarray(layer, jnp.int32), main_len.astype(jnp.int32),
        pos.astype(jnp.int32), wt, qi, qs.astype(jnp.float32),
        cache.k, cache.v, cache.k_scale, cache.v_scale,
        fresh.k, fresh.v, fresh.k_scale, fresh.v_scale, nkv, nsc,
        tuple(acc) if acc is not None else None,
        scale=float(scale),
        softcap=None if softcap is None else float(softcap),
        merge_new=merge_new, emit_fresh=emit_fresh, quant_q=quant_q)
    if emit_fresh in ("emit", "alias"):
        o32, kf, vf, ksf, vsf = outs
        return o32, (kf, vf, ksf, vsf)
    return outs[0], None


def _pick_tb(B: int, KV: int, D: int, S: int, W: int,
             budget=4 * 1024 * 1024) -> int:
    per_slot = KV * ((2 * D + 8) * (S + W))
    for tb in (8, 4, 2, 1):
        if B % tb == 0 and tb * per_slot <= budget:
            return tb
    return 1


@partial(jax.jit, static_argnames=("scale", "softcap", "has_fresh",
                                   "out_dtype"))
def _call(layer, mlen, pos, wt, q, kc, vc, ks, vs, fresh_bufs, *, scale,
          softcap, has_fresh, out_dtype):
    B, KV, r, D = q.shape
    S = kc.shape[-1]
    W = fresh_bufs[0].shape[-2] if has_fresh else 0  # codes (L,B,KV,W,D)
    tb = _pick_tb(B, KV, D, S, W)
    interpret = jax.default_backend() != "tpu"

    main_specs = [
        pl.BlockSpec((tb, KV, r, D), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, KV, D, S), lambda i, l, *_: (l[0], i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, KV, D, S), lambda i, l, *_: (l[0], i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, KV, 1, S), lambda i, l, *_: (l[0], i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, KV, 1, S), lambda i, l, *_: (l[0], i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    fresh_specs = [
        pl.BlockSpec((1, tb, KV, W, D), lambda i, l, *_: (l[0], i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, KV, W, D), lambda i, l, *_: (l[0], i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, KV, 1, W), lambda i, l, *_: (l[0], i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, KV, 1, W), lambda i, l, *_: (l[0], i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] if has_fresh else []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # layer, mlen, pos, [window, t]
        grid=(B // tb,),
        in_specs=main_specs + fresh_specs,
        out_specs=pl.BlockSpec((tb, KV, r, D), lambda i, *_: (i, 0, 0, 0)),
    )
    nbytes = (2 * B * KV * (D + 4) * S
              + (2 * B * KV * (D + 4) * W if has_fresh else 0))
    return pl.pallas_call(
        partial(_kernel, tb=tb, scale=scale, softcap=softcap,
                has_fresh=has_fresh),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, r, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KV * r * (S + W) * D,
            bytes_accessed=nbytes,
            transcendentals=B * KV * r * (S + W),
        ),
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32).ravel(), mlen, pos,
      wt, q, kc, vc, ks, vs, *fresh_bufs)


def decode_attention(q, cache_k, cache_v, k_scale, v_scale, layer, main_len,
                     pos, window, t=0, fresh=None, *, scale: float,
                     softcap=None, out_dtype=jnp.float32):
    """q (B, KV, r, D) -> attention output (B, KV, r, D) f32.

    ``cache_*``: (L, B, KV, D, S) int8 codes + (L, B, KV, 1, S) f32 scales.
    ``main_len`` (B,): main lanes s < main_len attend. ``pos`` (B,): the
    current token's absolute position (window mask: s > pos - window).
    ``fresh``: optional (kf, vf, ksf, vsf) FreshKV buffers — codes
    (L, B, KV, W, D) (step on sublanes, the round-5 layout), scales
    (L, B, KV, 1, W) — fresh step j attends for j <= ``t``.
    ``layer``/``window``/``t`` may be traced scalars (scan data)."""
    wt = jnp.stack([jnp.asarray(window, jnp.int32).reshape(()),
                    jnp.asarray(t, jnp.int32).reshape(())])
    return _call(jnp.asarray(layer, jnp.int32), main_len.astype(jnp.int32),
                 pos.astype(jnp.int32), wt, q, cache_k, cache_v,
                 k_scale, v_scale, tuple(fresh) if fresh is not None else (),
                 scale=float(scale),
                 softcap=None if softcap is None else float(softcap),
                 has_fresh=fresh is not None, out_dtype=out_dtype)


def append_supported(cfg, S: int) -> bool:
    """Shape gate for the round-5 fused-append kernel (_kernel_append):
    int8 cache decode, no ALiBi (BLOOM's bias over absolute positions
    stays on the XLA path), 128-aligned main window, 8-aligned head dim,
    uniform GQA. Env gating lives in engine.generate._ATTN_APPEND_OPTIN
    (latched at import)."""
    if cfg.pos_embedding == "alibi":
        return False
    return (S % 128 == 0 and cfg.head_dim % 8 == 0
            and cfg.num_heads % cfg.num_kv_heads == 0)


def supported(cfg, S: int) -> bool:
    """Kernel shape gate for single-token decode on an int8 cache; ALiBi
    (BLOOM) stays on the XLA path.

    OFF BY DEFAULT (opt-in: LLMC_FUSED_ATTN=1). Round-4 verdict of the
    serving A/B (benchmarks/bench_attention_fresh.py, attn_update*.log):
    read-only the kernel runs at ~520 GB/s — 1.7x the XLA two-part path —
    but EVERY arrangement of the per-step fresh-lane write lost more than
    that gain: an XLA DUS feeding the kernel copy-protects the FreshKV
    set (525 us/layer); fusing the write in-kernel with per-program
    aliased blocks serializes the grid pipeline (174 us/layer); a
    separate single-program aliased write kernel still measures
    ~146 us/layer of copy/serialization; Mosaic rejects 1-lane output
    blocks outright (lane blocks must be 128-divisible or full). The XLA
    fresh path (engine/generate._fresh_attention) stays the serving
    default; the kernel remains for read-only windows and future
    fresh-layout work (a (L, B, KV, W, D) layout would allow an 8-sublane
    read-modify-write slab instead of a full-slice rewrite).

    The env var is LATCHED ONCE at module import (like LLMC_SCAN_UNROLL):
    decode_greedy_steps jit-caches on static args only, so a mid-process
    flip would silently not apply to already-compiled executables —
    per-process determinism is the honest contract (ADVICE r4)."""
    if not _FUSED_ATTN_OPTIN:
        return False
    if cfg.pos_embedding == "alibi":
        return False
    return (S % 128 == 0 and cfg.head_dim % 8 == 0
            and cfg.num_heads % cfg.num_kv_heads == 0)
