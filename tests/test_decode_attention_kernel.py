"""Opt-in Pallas decode-attention kernels (kernels/decode_attention.py).

These kernels are gated off the serving default (LLMC_FUSED_ATTN=1 —
every fresh-write arrangement lost its in-engine A/B, docs/serving.md),
but they ship as a supported opt-in and the next fresh-layout attempt
builds on them — so their numerics stay pinned here against the engine's
XLA epilogue (_i8_softmax_requant), in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_compressor_tpu.engine.generate import _i8_softmax_requant
from llm_compressor_tpu.kernels.decode_attention import (
    decode_attention,
    decode_attention_stats,
    fresh_write,
)

B, KV, r, D, S, W, L = 2, 2, 2, 8, 16, 4, 3
NEG = -1e9


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    return dict(
        kc=jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8)),
        vc=jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, S)).astype(np.int8)),
        ks=jnp.asarray(rng.uniform(.01, .03, (L, B, KV, 1, S)).astype(np.float32)),
        vs=jnp.asarray(rng.uniform(.01, .03, (L, B, KV, 1, S)).astype(np.float32)),
        # round-5 FreshKV layout: codes (L, B, KV, W, D), step on sublanes
        kf=jnp.asarray(rng.integers(-127, 128, (L, B, KV, W, D)).astype(np.int8)),
        vf=jnp.asarray(rng.integers(-127, 128, (L, B, KV, W, D)).astype(np.int8)),
        ksf=jnp.asarray(rng.uniform(.01, .03, (L, B, KV, 1, W)).astype(np.float32)),
        vsf=jnp.asarray(rng.uniform(.01, .03, (L, B, KV, 1, W)).astype(np.float32)),
        q=jnp.asarray(rng.normal(size=(B, KV, r, D)).astype(np.float32)),
        len0=jnp.asarray([S - 2, S - 5], jnp.int32),
    )


def _row_quant(x):
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(absmax / 127.0, 1e-8)
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s


def _xla_reference(d, li, t, window=0, scale=0.35):
    """The engine's two-part XLA epilogue on the same inputs."""
    qi, qs = _row_quant(d["q"])
    dots = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    dotv = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    dots_f = lambda a, b: jax.lax.dot_general(     # fresh (B, KV, W, D)
        a, b, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    dotv_f = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    s_m = dots(qi, d["kc"][li]).astype(jnp.float32) * qs * d["ks"][li] * scale
    s_f = dots_f(qi, d["kf"][li]).astype(jnp.float32) * qs * d["ksf"][li] * scale
    len0, w = d["len0"], jnp.int32(window)
    pos = len0 + t
    sm = jnp.arange(S)[None, :]
    sf = jnp.arange(W)[None, :]
    keep_m = (sm < len0[:, None]) & ((w <= 0) | (sm > (pos - w)[:, None]))
    keep_f = (sf <= t) & ((w <= 0) | ((len0[:, None] + sf) > (pos - w)[:, None]))
    s_m = jnp.where(keep_m[:, None, None, :], s_m, NEG)
    s_f = jnp.where(keep_f[:, None, None, :], s_f, NEG)
    pis, osc = _i8_softmax_requant([s_m, s_f], [d["vs"][li], d["vsf"][li]],
                                   None)
    o32 = dotv(pis[0], d["vc"][li]) + dotv_f(pis[1], d["vf"][li])
    return o32.astype(jnp.float32) * osc


@pytest.mark.parametrize("li,t,window", [(0, 2, 0), (2, 3, 0), (1, 1, 6)])
def test_two_part_kernel_matches_xla_epilogue(data, li, t, window):
    ref = np.asarray(_xla_reference(data, li, t, window))
    got = np.asarray(decode_attention(
        data["q"], data["kc"], data["vc"], data["ks"], data["vs"],
        li, data["len0"], data["len0"] + t, window, t,
        fresh=(data["kf"], data["vf"], data["ksf"], data["vsf"]),
        scale=0.35))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_single_window_kernel_matches_xla(data):
    """fresh=None: the carried-window form (keep s < main_len)."""
    d = data
    qi, qs = _row_quant(d["q"])
    s = jax.lax.dot_general(
        qi, d["kc"][1], dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32
    ).astype(jnp.float32) * qs * d["ks"][1] * 0.35
    keep = jnp.arange(S)[None, :] < d["len0"][:, None]
    s = jnp.where(keep[:, None, None, :], s, NEG)
    pis, osc = _i8_softmax_requant([s], [d["vs"][1]], None)
    o32 = jax.lax.dot_general(
        pis[0], d["vc"][1], dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    ref = np.asarray(o32.astype(jnp.float32) * osc)
    got = np.asarray(decode_attention(
        d["q"], d["kc"], d["vc"], d["ks"], d["vs"], 1, d["len0"],
        d["len0"] - 1, 0, 0, fresh=None, scale=0.35))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_stats_kernel_hybrid_assembly_matches(data):
    """decode_attention_stats + the engine's XLA fresh-side assembly ==
    the all-XLA epilogue (up to the exp(m_f - m) rescale rounding)."""
    d = data
    li, t, scale = 1, 2, 0.35
    qi, qs = _row_quant(d["q"])
    s_f = jax.lax.dot_general(
        qi, d["kf"][li], dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32
    ).astype(jnp.float32) * qs * d["ksf"][li] * scale
    keep_f = jnp.arange(W)[None, :] <= t
    s_f = jnp.where(keep_f[:, None, None, :], s_f, NEG)
    m_f = s_f.max(-1, keepdims=True)
    e_f = jnp.exp(s_f - m_f)
    sum_f = e_f.sum(-1, keepdims=True)
    w_f = e_f * d["vsf"][li]
    wfm = w_f.max(-1, keepdims=True)
    o32m, m, a, sum_m = decode_attention_stats(
        qi, qs, m_f, wfm, d["kc"], d["vc"], d["ks"], d["vs"], li,
        d["len0"], d["len0"] + t, 0, scale=scale)
    r_f = jnp.exp(m_f - m)
    pi_f = jnp.clip(jnp.round(w_f * (r_f / a)), -127, 127).astype(jnp.int8)
    o32f = jax.lax.dot_general(
        pi_f, d["vf"][li], dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)
    got = np.asarray((o32m + o32f.astype(jnp.float32))
                     * (a / (sum_m + sum_f * r_f)))
    ref = np.asarray(_xla_reference(d, li, t))
    # int8 prob codes may differ by 1 from the rescale rounding — bound
    # the output by one code's worth of V contribution
    tol = float(np.max(np.asarray(d["vsf"][li]))) * 2.0
    np.testing.assert_allclose(got, ref, atol=tol, rtol=1e-3)


def test_fresh_write_matches_dus(data):
    """fresh_write is the round-4 measured-losing aliased write kernel,
    kept as benchmark inventory; it operates on lane-sequence (.., D, W)
    buffers (the pre-round-5 layout), so this test builds its own."""
    d = data
    rng = np.random.default_rng(3)
    kf = jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, W)).astype(np.int8))
    vf = jnp.asarray(rng.integers(-127, 128, (L, B, KV, D, W)).astype(np.int8))
    nk = jnp.asarray(rng.integers(-127, 128, (B, KV, D, 1)).astype(np.int8))
    nv = jnp.asarray(rng.integers(-127, 128, (B, KV, D, 1)).astype(np.int8))
    nks = jnp.asarray(rng.uniform(.01, .03, (B, KV, 1, 1)).astype(np.float32))
    nvs = jnp.asarray(rng.uniform(.01, .03, (B, KV, 1, 1)).astype(np.float32))
    li, t = 2, 1
    kfo, vfo, ksfo, vsfo = fresh_write(
        (kf, vf, d["ksf"], d["vsf"]), (nk, nv, nks, nvs), li, t)
    idx = (li, 0, 0, 0, t)
    ref_k = jax.lax.dynamic_update_slice(kf, nk[None], idx)
    ref_ks = jax.lax.dynamic_update_slice(d["ksf"], nks[None], idx)
    np.testing.assert_array_equal(np.asarray(kfo), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(ksfo), np.asarray(ref_ks))
    np.testing.assert_array_equal(
        np.asarray(vfo),
        np.asarray(jax.lax.dynamic_update_slice(vf, nv[None], idx)))
    np.testing.assert_array_equal(
        np.asarray(vsfo),
        np.asarray(jax.lax.dynamic_update_slice(d["vsf"], nvs[None], idx)))
