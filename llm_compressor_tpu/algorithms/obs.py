"""Blocked OBS (optimal brain surgeon) weight updates — GPTQ / SparseGPT /
GPTAQ numerical core, redesigned for XLA.

Reference: gptq/core.py:163-281, sparsegpt/core.py:160-228,
gptaq/core.py:198-335. The torch versions run a Python loop with in-place
column slicing; here the inner column loop is a ``lax.fori_loop`` over a
fixed-size block with masked full-width rank-1 updates (static shapes), and
the block loop is a short unrolled Python loop — the whole update jits into
one XLA program per weight shape.

Semantics preserved exactly:
* H = 2/n * X X^T with dead-column handling (diag==0 -> 1, W col zeroed)
* damping: ``percdamp * mean(diag)`` added to the diagonal, x10 on Cholesky
  failure (the reference retries when torch raises; XLA Cholesky returns
  NaN instead, so we detect NaN host-side)
* Hinv = upper Cholesky factor U of H^{-1} (H^{-1} = U^T U)
* act-order permutation by descending diag(H): per-column for group_size in
  (0, -1); per-GROUP (block-granular) for group_size > 0, with scales
  recomputed on the permuted W
* per-group branch quantizes a whole group at once against its fixed scale
  (no intra-group error propagation) then propagates error to later columns
* the pruning MASK (W != 0) multiplies every quantized column
* GPTAQ adds the asymmetric-calibration correction
  P = alpha * triu(dXXT @ Hinv^T, 1) @ Hinv to every propagation step
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from ..qformats.quantize import Quantizer, fake_quantize_blocked, find_params


def _prep(W, H):
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)
    dead = jnp.diag(H) == 0
    H = H + jnp.diag(dead.astype(jnp.float32))
    W = W * (~dead)[None, :]
    return W, H, dead


def _actorder_perm(H: jnp.ndarray, group: int) -> jnp.ndarray:
    d = jnp.diag(H)
    if group > 1:
        gsum = d.reshape(-1, group).sum(-1)
        return jnp.argsort(-gsum)
    return jnp.argsort(-d)


def _permute_cols(W, perm, group):
    if group > 1:
        N, K = W.shape
        return W.reshape(N, K // group, group)[:, perm, :].reshape(N, K)
    return W[:, perm]


def _permute_sym(M, perm, group):
    if group > 1:
        K = M.shape[0]
        G = K // group
        M4 = M.reshape(G, group, G, group)
        M4 = M4[perm][:, :, perm, :]
        return M4.reshape(K, K)
    return M[perm][:, perm]


def _fq_cols(q: Quantizer, w: jnp.ndarray, scales, zeros):
    """Fake-quantize a (N, g) column group with fixed per-row params.
    Blocked shape is (N, 1, g) so scales (N, 1, 1) broadcast per row."""
    wb = w[:, None, :]
    out = fake_quantize_blocked(q, wb, scales, zeros)
    return out[:, 0, :]


@partial(jax.jit, static_argnames=("quantizer", "blocksize", "actorder", "use_p"))
def _gptq_core(W, H, dXXT, *, quantizer: Quantizer, blocksize: int,
               actorder: bool, use_p: bool, alpha: float = 0.25):
    """Jitted GPTQ/GPTAQ update. dXXT may be a dummy zeros array when
    use_p=False (static flag keeps it out of the graph)."""
    N, C = W.shape
    gs = quantizer.group_size
    group = gs if gs and gs > 0 else 0
    if gs == -2:
        raise NotImplementedError("GPTQ with per-channel (-2) weight groups")

    W, H, dead = _prep(W, H)
    if use_p:
        dXXT = dXXT.astype(jnp.float32) * (~dead)[None, :]
    MASK = (W != 0).astype(jnp.float32)

    perm = None
    if actorder:
        perm = _actorder_perm(H, group)
        W = _permute_cols(W, perm, group)
        MASK = _permute_cols(MASK, perm, group)
        H = _permute_sym(H, perm, group)
        if use_p:
            dXXT = _permute_sym(dXXT, perm, group)

    scales, zeros = find_params(quantizer, W)

    Hinv = hessian_inverse_factor_traced(H)
    if use_p:
        P = alpha * (jnp.triu(dXXT @ Hinv.T, k=1) @ Hinv)
    else:
        P = None

    col_idx = jnp.arange(C)
    Q = jnp.zeros_like(W)

    for i1 in range(0, C, blocksize):
        i2 = min(i1 + blocksize, C)
        count = i2 - i1
        W1 = W[:, i1:i2]
        M1 = MASK[:, i1:i2]
        Hinv1 = Hinv[i1:i2, i1:i2]
        P1 = P[i1:i2, i1:i2] if use_p else None
        in_idx = jnp.arange(count)

        if group == 0:
            # column-at-a-time with error compensation
            def body(i, carry):
                W1c, Q1, E1 = carry
                w = jax.lax.dynamic_slice_in_dim(W1c, i, 1, axis=1)[:, 0]
                m = jax.lax.dynamic_slice_in_dim(M1, i, 1, axis=1)[:, 0]
                d = jax.lax.dynamic_index_in_dim(jnp.diag(Hinv1), i, keepdims=False)
                q = _fq_cols(quantizer, w[:, None], scales, zeros)[:, 0] * m
                err = (w - q) / d
                row = jax.lax.dynamic_slice_in_dim(Hinv1, i, 1, axis=0)[0]
                tail = (in_idx >= i).astype(jnp.float32)
                upd = err[:, None] * (row * tail)[None, :]
                if use_p:
                    prow = jax.lax.dynamic_slice_in_dim(P1, i, 1, axis=0)[0]
                    upd = upd - w[:, None] * (prow * tail)[None, :]
                W1c = W1c - upd
                Q1 = jax.lax.dynamic_update_slice_in_dim(Q1, q[:, None], i, axis=1)
                E1 = jax.lax.dynamic_update_slice_in_dim(E1, err[:, None], i, axis=1)
                return W1c, Q1, E1

            W1f, Q1, Err1 = jax.lax.fori_loop(
                0, count, body, (W1, jnp.zeros_like(W1), jnp.zeros_like(W1))
            )
        else:
            # group-at-a-time (static unroll: count/group iterations)
            Q1 = jnp.zeros_like(W1)
            Err1 = jnp.zeros_like(W1)
            W1f = W1
            for i in range(0, count, group):
                jg = (i1 + i) // group
                w = W1f[:, i : i + group]
                m = M1[:, i : i + group]
                d = jnp.diag(Hinv1[i : i + group, i : i + group])
                s = scales[:, jg : jg + 1, :]
                z = zeros[:, jg : jg + 1, :]
                q = _fq_cols(quantizer, w, s, z) * m
                err = (w - q) / d[None, :]
                rows = Hinv1[i : i + group, :]
                tail = (in_idx >= i).astype(jnp.float32)
                upd = err @ (rows * tail[None, :])
                if use_p:
                    prows = P1[i : i + group, :]
                    upd = upd - w @ (prows * tail[None, :])
                W1f = W1f - upd
                Q1 = Q1.at[:, i : i + group].set(q)
                Err1 = Err1.at[:, i : i + group].set(err)

        Q = Q.at[:, i1:i2].set(Q1)
        tail_mask = (col_idx >= i2).astype(jnp.float32)
        upd = Err1 @ (Hinv[i1:i2, :] * tail_mask[None, :])
        if use_p:
            upd = upd - W1f @ (P[i1:i2, :] * tail_mask[None, :])
        W = W - upd
        # keep already-quantized region intact (the masked update touches
        # only cols >= i2, but be explicit about the block we just wrote)

    if actorder:
        invperm = jnp.argsort(perm)
        Q = _permute_cols(Q, invperm, group)
        if group > 1:
            scales = scales[:, invperm, :]
            zeros = zeros[:, invperm, :]
    return Q, scales, zeros


# The Cholesky retry needs a host-side NaN check, which cannot live inside
# jit. Inside the traced core we use a single attempt with a NaN-safe
# fallback damp selected via lax.cond.
def hessian_inverse_factor_traced(H: jnp.ndarray, percdamp: float = 0.01):
    def attempt(damp_scale):
        damp = damp_scale * jnp.mean(jnp.diag(H))
        Hd = H + jnp.eye(H.shape[0], dtype=H.dtype) * damp
        L = jnp.linalg.cholesky(Hd)
        Hinv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(H.shape[0], dtype=H.dtype))
        Hinv = (Hinv + Hinv.T) / 2.0
        return jnp.linalg.cholesky(Hinv).T

    U = attempt(jnp.float32(percdamp))
    bad = jnp.any(jnp.isnan(U))
    U10 = attempt(jnp.float32(percdamp * 10.0))
    return jnp.where(bad, U10, U)


def gptq_update_with_params(W, H, quantizer: Quantizer, blocksize: int = 128,
                            actorder: bool = True):
    """GPTQ update returning (Q, scales, zeros) — the exact group params the
    quantized columns were rounded against (act-order unpermuted), for
    lossless packing."""
    dummy = jnp.zeros((1, 1), jnp.float32)
    with jax.default_matmul_precision("highest"):
        return _gptq_core(W, H, dummy, quantizer=quantizer, blocksize=blocksize,
                          actorder=actorder, use_p=False)


def gptaq_update_with_params(W, H, dXXT, quantizer: Quantizer, blocksize: int = 128,
                             actorder: bool = True, alpha: float = 0.25):
    with jax.default_matmul_precision("highest"):
        return _gptq_core(W, H, dXXT, quantizer=quantizer, blocksize=blocksize,
                          actorder=actorder, use_p=True, alpha=alpha)


def gptq_update(W, H, quantizer: Quantizer, blocksize: int = 128,
                actorder: bool = True) -> jnp.ndarray:
    """GPTQ error-compensated quantization of one weight matrix.

    Traced under full-f32 matmul precision: the error-propagation algebra is
    numerically delicate and must not run as bf16 MXU passes."""
    dummy = jnp.zeros((1, 1), jnp.float32)
    with jax.default_matmul_precision("highest"):
        Q, _, _ = _gptq_core(W, H, dummy, quantizer=quantizer, blocksize=blocksize,
                             actorder=actorder, use_p=False)
    return Q


def gptaq_update(W, H, dXXT, quantizer: Quantizer, blocksize: int = 128,
                 actorder: bool = True, alpha: float = 0.25) -> jnp.ndarray:
    """GPTAQ: GPTQ + asymmetric-error correction term."""
    with jax.default_matmul_precision("highest"):
        Q, _, _ = _gptq_core(W, H, dXXT, quantizer=quantizer, blocksize=blocksize,
                             actorder=actorder, use_p=True, alpha=alpha)
    return Q


def sparsegpt_update(W, H, sparsity_ratio: float, blocksize: int = 128):
    """SparseGPT blocked OBS pruning (reference sparsegpt/core.py:160-228):
    mask by W^2/diag(Hinv)^2 threshold per 128-column block, column-wise
    error compensation through Hinv."""
    with jax.default_matmul_precision("highest"):
        return _sparsegpt_core(W, H, sparsity_ratio, blocksize=blocksize)


@partial(jax.jit, static_argnames=("sparsity_ratio", "blocksize"))
def _sparsegpt_core(W, H, sparsity_ratio: float, blocksize: int = 128):
    N, C = W.shape
    W, H, _dead = _prep(W, H)
    Hinv = hessian_inverse_factor_traced(H)
    col_idx = jnp.arange(C)

    for i1 in range(0, C, blocksize):
        i2 = min(i1 + blocksize, C)
        count = i2 - i1
        W1 = W[:, i1:i2]
        Hinv1 = Hinv[i1:i2, i1:i2]
        dinv = jnp.diag(Hinv1)
        in_idx = jnp.arange(count)

        tmp = W1**2 / dinv[None, :] ** 2
        k = int(tmp.size * sparsity_ratio)
        thresh = jnp.sort(tmp.ravel())[k]
        MASK1 = tmp <= thresh  # True = prune

        def body(i, carry):
            W1c, Q1, E1 = carry
            w = jax.lax.dynamic_slice_in_dim(W1c, i, 1, axis=1)[:, 0]
            m = jax.lax.dynamic_slice_in_dim(MASK1, i, 1, axis=1)[:, 0]
            d = jax.lax.dynamic_index_in_dim(dinv, i, keepdims=False)
            q = jnp.where(m, 0.0, w)
            err = (w - q) / d
            row = jax.lax.dynamic_slice_in_dim(Hinv1, i, 1, axis=0)[0]
            tail = (in_idx >= i).astype(jnp.float32)
            W1c = W1c - err[:, None] * (row * tail)[None, :]
            Q1 = jax.lax.dynamic_update_slice_in_dim(Q1, q[:, None], i, axis=1)
            E1 = jax.lax.dynamic_update_slice_in_dim(E1, err[:, None], i, axis=1)
            return W1c, Q1, E1

        _, Q1, Err1 = jax.lax.fori_loop(
            0, count, body, (W1, jnp.zeros_like(W1), jnp.zeros_like(W1))
        )
        W = W.at[:, i1:i2].set(Q1)
        tail_mask = (col_idx >= i2).astype(jnp.float32)
        W = W - Err1 @ (Hinv[i1:i2, :] * tail_mask[None, :])
    return W
