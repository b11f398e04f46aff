"""Fast Walsh-Hadamard transform — XLA path + Pallas TPU kernel.

TPU-native counterpart of the reference's vendored CUDA extension
(reference third_party/fast-hadamard-transform/csrc/*.cu and the fallback
matmul_hadU, spinquant/hadamard_utils.py:88-132): y = x H_n / sqrt(n) where
n = 2^k * K and H_n = H_K (kron) H_{2^k}. The power-of-two part is a
Sylvester butterfly; the non-power-of-two base H_K (K in {12, 20, 36, 44})
is CONSTRUCTED here via Paley I/II over GF(p) — a mathematical object, not
a table copy (the reference embeds ~99K generated lines of literals).

The Pallas kernel runs the butterfly stages in VMEM (one HBM round trip for
the whole transform — the memcpy-bound regime the reference benchmarks its
CUDA kernel against).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Paley constructions for non-power-of-two base sizes
# ---------------------------------------------------------------------------


def _prime_power(q: int):
    """(p, k) with q = p^k for prime p, else None."""
    for p in range(2, q + 1):
        if p * p > q and p != q:
            break
        if q % p == 0:
            k = 0
            m = q
            while m % p == 0:
                m //= p
                k += 1
            return (p, k) if m == 1 else None
    return (q, 1)


def _gf_tables(p: int, k: int):
    """Addition/multiplication over GF(p^k); elements are integers whose
    base-p digits are polynomial coefficients (mod an irreducible monic
    degree-k polynomial found by exhaustive root/factor check)."""
    q = p ** k
    if k == 1:
        add = (np.arange(p)[:, None] + np.arange(p)[None, :]) % p
        mul = (np.arange(p)[:, None] * np.arange(p)[None, :]) % p
        return add, mul

    def digits(e):
        return [(e // p ** i) % p for i in range(k)]

    def undig(c):
        return sum((ci % p) * p ** i for i, ci in enumerate(c))

    def polymul_mod(a, b, red):
        # a, b coefficient lists (low->high); reduce by monic ``red`` of deg k
        out = [0] * (len(a) + len(b) - 1)
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                out[i + j] = (out[i + j] + ai * bj) % p
        for d in range(len(out) - 1, k - 1, -1):
            c = out[d]
            if c:
                out[d] = 0
                for i in range(k):
                    out[d - k + i] = (out[d - k + i] - c * red[i]) % p
        return out[:k]

    # find an irreducible monic poly x^k + r_{k-1} x^{k-1} + ... + r_0:
    # irreducible over GF(p) for k <= 3 iff it has no root in GF(p)
    assert k <= 3, "GF(p^k) tables implemented for k <= 3"
    red = None
    for tail in range(p ** k):
        r = digits(tail)
        if all(sum(rc * x ** i for i, rc in enumerate(r)) % p != (-x ** k) % p
               for x in range(p)):
            red = r
            break
    assert red is not None
    add = np.zeros((q, q), np.int64)
    mul = np.zeros((q, q), np.int64)
    for a in range(q):
        da = digits(a)
        for b in range(q):
            db = digits(b)
            add[a, b] = undig([x + y for x, y in zip(da, db)])
            mul[a, b] = undig(polymul_mod(da, db, red))
    return add, mul


def _jacobsthal(q: int) -> np.ndarray:
    """Q[i, j] = chi(a_i - a_j) with chi the quadratic character of
    GF(q) — any prime power q (the reference's tables only ever encode
    Paley matrices; here they are constructed)."""
    p, k = _prime_power(q)
    add, mul = _gf_tables(p, k)
    neg = np.array([int(np.where(add[b] == 0)[0][0]) for b in range(q)])
    squares = set(int(mul[a, a]) for a in range(1, q))
    chi = np.array([0] + [1 if a in squares else -1 for a in range(1, q)],
                   dtype=np.int64)
    diff = add[np.arange(q)[:, None], neg[None, :]]   # a_i + (-a_j)
    return chi[diff]


def _paley1(p: int) -> np.ndarray:
    """Hadamard matrix of order p+1 for prime p = 3 (mod 4):
    H = I + S with the skew core S = [[0, e^T], [-e, Q]]."""
    assert p % 4 == 3
    Q = _jacobsthal(p)
    n = p + 1
    H = np.ones((n, n), dtype=np.int64)
    H[1:, 1:] = Q + np.eye(p, dtype=np.int64)
    H[1:, 0] = -1
    return H


def _paley2(p: int) -> np.ndarray:
    """Hadamard matrix of order 2(p+1) for prime p = 1 (mod 4)."""
    assert p % 4 == 1
    Q = _jacobsthal(p)
    m = p + 1
    S = np.zeros((m, m), dtype=np.int64)
    S[0, 1:] = 1
    S[1:, 0] = 1
    S[1:, 1:] = Q
    # Paley II block rule: S_ij=0 -> [[1,-1],[-1,-1]], else S_ij*[[1,1],[1,-1]]
    H = np.zeros((2 * m, 2 * m), dtype=np.int64)
    Z = np.array([[1, -1], [-1, -1]])
    P = np.array([[1, 1], [1, -1]])
    for i in range(m):
        for j in range(m):
            H[2 * i : 2 * i + 2, 2 * j : 2 * j + 2] = Z if S[i, j] == 0 else S[i, j] * P
    return H


# K -> (construction, field size q). Covers the reference get_hadK sizes
# {12, 20, 28, 36, 40, 52, 60, 108, 140} (hadamard_utils.py:18-87): Paley I
# gives q+1 (q = 3 mod 4), Paley II gives 2(q+1) (q = 1 mod 4, incl. the
# prime power 25 for K=52); 40 = 20 * 2^1 needs no base of its own. The
# remaining table sizes 156/172 have no Paley construction (both need
# Williamson sequences — published tables, out of constructive scope).
_BASES = {
    12: (_paley1, 11), 20: (_paley1, 19), 28: (_paley2, 13),
    36: (_paley2, 17), 44: (_paley1, 43), 52: (_paley2, 25),
    60: (_paley2, 29), 108: (_paley1, 107), 140: (_paley1, 139),
}


@lru_cache(maxsize=None)
def base_hadamard(K: int) -> np.ndarray:
    """Base Hadamard matrix of non-power-of-two order K (verified)."""
    if K == 1:
        H = np.ones((1, 1), dtype=np.int64)
    elif K in _BASES:
        fn, q = _BASES[K]
        H = fn(q)
    else:
        raise ValueError(f"No Hadamard base construction for K={K}")
    assert np.array_equal(H @ H.T, K * np.eye(K, dtype=np.int64)), K
    return H


def decompose(n: int) -> tuple[int, int]:
    """n = 2^k * K for a supported base K. Returns (K, 2^k)."""

    def _is_pow2(v):
        return v > 0 and (v & (v - 1)) == 0

    for K in (1, *sorted(_BASES)):
        if n % K == 0 and _is_pow2(n // K):
            return K, n // K
    raise ValueError(f"Hadamard size {n} unsupported (need n = 2^k * K, "
                     f"K in {{1, {', '.join(map(str, sorted(_BASES)))}}})")


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------


def _fht_pow2(x: jnp.ndarray) -> jnp.ndarray:
    """Sylvester butterfly along the last axis (length power of two):
    one (..., n/2h, 2, h) reshape + add/sub per stage."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    h = 1
    while h < n:
        x = x.reshape(*lead, n // (2 * h), 2, h)
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = jnp.stack([a + b, a - b], axis=-2).reshape(*lead, n)
        h *= 2
    return x


def hadamard_transform(x: jnp.ndarray, scale: float | None = None) -> jnp.ndarray:
    """y = x H_n * scale along the last axis (default scale 1/sqrt(n))."""
    n = x.shape[-1]
    K, m = decompose(n)
    dtype = x.dtype
    out = x.astype(jnp.float32)
    if m > 1:
        out = out.reshape(*x.shape[:-1], K, m)
        out = _fht_pow2(out)
        if K > 1:
            Hk = jnp.asarray(base_hadamard(K), dtype=jnp.float32)
            out = jnp.einsum("kl,...lm->...km", Hk, out)
        out = out.reshape(*x.shape)
    elif K > 1:
        Hk = jnp.asarray(base_hadamard(K), dtype=jnp.float32)
        out = out @ Hk.T
    s = (1.0 / np.sqrt(n)) if scale is None else scale
    return (out * s).astype(dtype)


def hadamard_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Orthonormal H_n / sqrt(n) as an explicit matrix."""
    return hadamard_transform(jnp.eye(n, dtype=dtype))


def random_hadamard_matrix(n: int, key) -> jnp.ndarray:
    """Randomized orthonormal Hadamard: H diag(+-1) / sqrt(n)
    (reference rotation_utils.py:40-45, QuIP# construction)."""
    signs = jax.random.rademacher(key, (n,), dtype=jnp.float32)
    return hadamard_transform(jnp.diag(signs))


# ---------------------------------------------------------------------------
# Pallas kernel — whole transform in VMEM, one HBM round trip
# ---------------------------------------------------------------------------


def _fht_kernel(h128_ref, x_ref, out_ref, *, n: int, m: int, scale: float):
    """H_m on each of the row's n/m blocks, Kronecker-split for Mosaic:

        H_m = H_{m/128} (x) H_128   (Sylvester is Kronecker-associative)

    The H_128 factor runs as ONE (TB*n/128, 128) @ (128, 128) MXU matmul
    (H_128 is symmetric, so no transpose); the m/128 block factor runs as
    a sublane butterfly whose reshapes keep the lane dim pinned at 128.
    The previous in-kernel butterfly reshaped down to (..., 2, h) with
    h = 1, 2, 4... — lane dims Mosaic cannot tile; it never lowered
    on-chip (caught by scripts/tpu_smoke.py, round 5)."""
    x = x_ref[...].astype(jnp.float32)                 # (TB, n)
    tb = x.shape[0]
    mp = m // 128
    x = jax.lax.dot_general(                           # lanes: H_128 (MXU)
        x.reshape(tb * (n // 128), 128), h128_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # sublane butterfly over the mp 128-lane blocks of each m-chunk
    x = x.reshape(tb * (n // m), mp, 128)
    h = 1
    while h < mp:
        x = x.reshape(-1, mp // (2 * h), 2, h, 128)
        a = x[:, :, 0]
        b = x[:, :, 1]
        x = jnp.stack([a + b, a - b], axis=2)
        h *= 2
    out_ref[...] = (x.reshape(tb, n) * scale).astype(out_ref.dtype)


def hadamard_transform_pallas(x: jnp.ndarray, scale: float | None = None,
                              block_rows: int = 256) -> jnp.ndarray:
    """Pallas FHT over the last axis; rows are tiled over the grid.

    The kernel covers the power-of-two factor when it is 128-divisible
    (every hot rotation dim: hidden 2048/4096/8192...); a non-pow2 base
    K (12/20/28... — calibration-only dims) contracts in XLA around the
    kernel, and dims whose pow2 factor is below 128 take the pure-XLA
    path (they are a handful of lanes — nothing for a kernel to win)."""
    n = x.shape[-1]
    K, m = decompose(n)
    if m % 128 != 0:
        return hadamard_transform(x, scale)
    s = float(1.0 / np.sqrt(n)) if scale is None else float(scale)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, n)
    B = x2.shape[0]
    TB = min(block_rows, max(8, B))
    pad = (-B) % TB
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    h128 = hadamard_transform(jnp.eye(128, dtype=jnp.float32), scale=1.0)
    out = pl.pallas_call(
        partial(_fht_kernel, n=n, m=m, scale=s),
        grid=(x2.shape[0] // TB,),
        in_specs=[
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(h128, x2)
    out = out[:B]
    if K > 1:   # base contraction in XLA (MXU; K is small and static)
        Hk = jnp.asarray(base_hadamard(K), dtype=out.dtype)
        out = jnp.einsum("kl,blm->bkm", Hk,
                         out.reshape(B, K, m)).reshape(B, n)
    return out.reshape(*lead, n)
