"""SpinQuant — rotation-based outlier suppression, then GPTQ.

Reference: llm_compressor/quantization/calibrations/spinquant/{core.py:45-165,
rotation_utils.py:20-161, fuse_norm_utils.py:5-61, optimizer.py}. Pipeline:

1. untie embeddings (core.py:151-154)
2. fuse RMSNorm weights into adjacent linears + recenter embedding rows
   (fuse_norm_utils.py:29-61) — done host-side in float64, exactly as the
   reference's .double() math
3. R1 (hidden x hidden) rotation of embed/head/QKV/O/MLP, per-layer R2
   (head_dim) rotation of V/O per head (rotation_utils.py:57-159)
4. GPTQ on the rotated model

``mode="hadamard"`` uses randomized orthonormal Hadamard matrices
(kernels/hadamard.py); ``mode="optimize"`` learns R1/R2 with Cayley SGD on
the Stiefel manifold (the reference's SGDG optimizer, optimizer.py:47-189)
against the straight-through-estimated quantized CE loss, then saves
``R.npz``. Llama-family only, mirroring the reference (core.py:63-71).
"""

from __future__ import annotations

from dataclasses import replace
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..capture.pipeline import capture_layer0
from ..kernels.hadamard import random_hadamard_matrix
from ..models.config import ModelConfig
from ..models.transformer import forward
from ..qformats.config import QuantConfig
from ..qformats.quantize import quantize_dequant
from ..utils.logging import LOGGER
from .common import get_bias, get_weight, set_bias, set_weight
from .gptq import gptq


def _f64(x):
    return np.asarray(x, dtype=np.float64)


def fuse_layer_norms(params, cfg: ModelConfig) -> None:
    """Fold RMSNorm weights into following linears; recenter embeddings.
    Host-side float64 (matches the reference's .double() math)."""
    dt = params["embed"]["weight"].dtype

    E = _f64(params["embed"]["weight"])
    params["embed"]["weight"] = jnp.asarray(E - E.mean(-1, keepdims=True), dtype=dt)

    for lp in params["layers"]:
        for norm_key, slots in (("ln1", ("q", "k", "v")), ("ln2", ("gate", "up"))):
            w_norm = _f64(lp[norm_key]["weight"])
            for slot in slots:
                W = _f64(get_weight(lp, slot))
                set_weight(lp, slot, jnp.asarray(W * w_norm[None, :], dtype=dt))
            lp[norm_key]["weight"] = jnp.ones_like(lp[norm_key]["weight"])

    if "final_norm" in params and "lm_head" in params:
        w_norm = _f64(params["final_norm"]["weight"])
        Wh = _f64(params["lm_head"]["weight"])
        params["lm_head"]["weight"] = jnp.asarray(Wh * w_norm[None, :], dtype=dt)
        params["final_norm"]["weight"] = jnp.ones_like(params["final_norm"]["weight"])


def _rotate_params(params, cfg: ModelConfig, R1: np.ndarray, R2s) -> None:
    """Apply R1/R2 rotations to all weights (host float64, in place)."""
    dt = params["embed"]["weight"].dtype
    R1 = _f64(R1)
    d = cfg.head_dim

    def right(node_get, node_set, slot=None):
        W = _f64(node_get())
        node_set(jnp.asarray(W @ R1, dtype=dt))

    params["embed"]["weight"] = jnp.asarray(_f64(params["embed"]["weight"]) @ R1, dt)
    params["lm_head"]["weight"] = jnp.asarray(_f64(params["lm_head"]["weight"]) @ R1, dt)

    for i, lp in enumerate(params["layers"]):
        for slot in ("q", "k", "v", "gate", "up"):
            W = _f64(get_weight(lp, slot))
            set_weight(lp, slot, jnp.asarray(W @ R1, dt))
        for slot in ("o", "down"):
            W = _f64(get_weight(lp, slot))
            set_weight(lp, slot, jnp.asarray(R1.T @ W, dt))
            b = get_bias(lp, slot)
            if b is not None:
                set_bias(lp, slot, jnp.asarray(R1.T @ _f64(b), dt))

        R2 = _f64(R2s[i])
        # V: rotate per-head OUTPUT rows (rotation_utils.py:113-118)
        Wv = _f64(get_weight(lp, "v"))
        kvh = cfg.num_kv_heads
        Wv = np.einsum("hdi,de->hei", Wv.reshape(kvh, d, -1), R2).reshape(Wv.shape)
        set_weight(lp, "v", jnp.asarray(Wv, dt))
        # O: rotate per-head INPUT columns
        Wo = _f64(get_weight(lp, "o"))
        H = cfg.num_heads
        Wo = np.einsum("ohd,de->ohe", Wo.reshape(-1, H, d), R2).reshape(Wo.shape)
        set_weight(lp, "o", jnp.asarray(Wo, dt))


def _untie(params, cfg: ModelConfig) -> ModelConfig:
    if "lm_head" not in params:
        params["lm_head"] = {"weight": jnp.array(params["embed"]["weight"])}
        cfg = replace(cfg, tie_word_embeddings=False)
    return cfg


def load_rotations(path, cfg: ModelConfig):
    data = np.load(Path(path))
    R1 = data["R1"]
    R2s = [data[f"R2.{i}"] for i in range(cfg.num_layers)]
    return R1, R2s


def save_rotations(path, R1, R2s) -> None:
    np.savez(Path(path), R1=np.asarray(R1),
             **{f"R2.{i}": np.asarray(r) for i, r in enumerate(R2s)})


# ---------------------------------------------------------------------------
# Cayley-SGD rotation optimization (mode="optimize")
# ---------------------------------------------------------------------------


def _ste_qdq(q, x):
    """Straight-through fake quantization (identity gradient)."""
    if q.qtype == "dummy":
        return x
    return x + jax.lax.stop_gradient(quantize_dequant(q, x) - x)


def _cayley_step(R, G, lr: float):
    """Simple Cayley retraction fallback: R <- (I + a/2 A)^-1 (I - a/2 A) R
    with A = G R^T - R G^T (momentum-free, exact solve)."""
    A = G @ R.T - R @ G.T
    n = R.shape[0]
    I = jnp.eye(n, dtype=R.dtype)
    return jnp.linalg.solve(I + (lr / 2) * A, (I - (lr / 2) * A) @ R)


def _sgdg_stiefel_step(R, G, V, lr, momentum: float = 0.0, eps: float = 1e-8):
    """Faithful SGDG Stiefel update (reference optimizer.py:121-160):

    * X = row-normalized parameter (``unit``)
    * momentum buffer V <- momentum * V - G^T  (n x p, tangent-space)
    * canonical tangent projection W = skew(MX - 0.5 * X^T X M X)
    * adaptive step alpha = min(lr, 1 / (||W||_1 + eps))
    * 5-iteration Cayley fixed-point loop Y = X^T + alpha * W (X^T + Y)/2
    * buffer projected back: V <- W X^T

    The reference instantiates SGDG with the default momentum=0
    (core.py:125-127) — the buffer machinery is kept for parity and for
    callers that want momentum.
    Returns (R_new, V_new).
    """
    X = R / (jnp.linalg.norm(R, axis=1, keepdims=True) + eps)
    V = momentum * V - G.T
    MX = V @ X
    XMX = X @ MX
    XXMX = X.T @ XMX
    W_hat = MX - 0.5 * XXMX
    W = W_hat - W_hat.T
    # matrix_norm_one: max column sum of |W| (optimizer.py:17-21,156)
    t = 1.0 / (jnp.max(jnp.sum(jnp.abs(W), axis=0)) + eps)
    alpha = jnp.minimum(t, lr)
    Xt = X.T
    Y = Xt + alpha * V
    for _ in range(5):  # Cayley_loop (optimizer.py:24-29)
        Y = Xt + alpha * (W @ (0.5 * (Xt + Y)))
    return Y.T, W @ Xt


def _qr_retract(R: np.ndarray) -> np.ndarray:
    """Sign-fixed QR re-orthonormalization (reference qr_retraction,
    optimizer.py:32-42) — the reference applies it with 1% probability per
    step to bound orthogonality drift; we apply it deterministically on a
    fixed period instead (jit-friendly, reproducible)."""
    q, r = np.linalg.qr(np.asarray(R, np.float64).T)
    q = q * np.sign(np.diag(r))[None, :]
    return q.T.astype(np.float32)


def make_rotated_ste_loss(params, cfg: ModelConfig, qcfg: QuantConfig):
    """Build loss_fn(R1, R2s, toks) -> CE of the rotated, STE-quantized model
    (the training objective of reference core.py:111-136: every QLinear
    re-rotates and re-quantizes its weight on the fly, qlinear.py:58-84)."""
    wq = qcfg.linear.weight
    d = cfg.head_dim

    def rotated_forward(R1, R2s, toks):
        # rotate weights in-graph (f32) with STE quantization
        p = jax.tree_util.tree_map(lambda x: x, params)
        p["embed"] = dict(p["embed"], weight=(params["embed"]["weight"].astype(jnp.float32) @ R1))
        p["lm_head"] = dict(p["lm_head"], weight=_ste_qdq(
            qcfg.head.weight, params["lm_head"]["weight"].astype(jnp.float32) @ R1))
        new_layers = []
        for i, lp in enumerate(params["layers"]):
            nl = jax.tree_util.tree_map(lambda x: x, lp)
            for slot in ("q", "k", "gate", "up"):
                W = get_weight(lp, slot).astype(jnp.float32) @ R1
                set_weight(nl, slot, _ste_qdq(wq, W))
            Wv = get_weight(lp, "v").astype(jnp.float32) @ R1
            Wv = jnp.einsum("hdi,de->hei", Wv.reshape(cfg.num_kv_heads, d, -1),
                            R2s[i]).reshape(Wv.shape)
            set_weight(nl, "v", _ste_qdq(wq, Wv))
            Wo = R1.T @ get_weight(lp, "o").astype(jnp.float32)
            Wo = jnp.einsum("ohd,de->ohe", Wo.reshape(-1, cfg.num_heads, d),
                            R2s[i]).reshape(Wo.shape)
            set_weight(nl, "o", _ste_qdq(wq, Wo))
            Wd = R1.T @ get_weight(lp, "down").astype(jnp.float32)
            set_weight(nl, "down", _ste_qdq(wq, Wd))
            new_layers.append(nl)
        p["layers"] = new_layers
        logits = forward(p, cfg, toks, qcfg).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        ll = jnp.take_along_axis(logp, toks[:, 1:, None], axis=-1)
        return -jnp.mean(ll)

    return rotated_forward


def optimize_rotations(params, cfg: ModelConfig, calib_tokens, qcfg: QuantConfig,
                       n_steps: int = 100, lr: float = 1.5, momentum: float = 0.0,
                       batch: int = 1, seed: int = 0, qr_period: int = 50):
    """Learn R1 (+ per-layer R2) minimizing the CE of the rotated,
    STE-quantized model on calibration batches.

    Optimization matches the reference training setup (core.py:111-136):
    SGDG Stiefel steps at lr 1.5 under a cosine learning-rate schedule (the
    HF Trainer's ``lr_scheduler_type='cosine'``), R1 and the per-layer R2s
    in one parameter group."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    R1 = random_hadamard_matrix(cfg.hidden_size, k1).astype(jnp.float32)
    R2s = jnp.stack([
        random_hadamard_matrix(cfg.head_dim, k).astype(jnp.float32)
        for k in jax.random.split(k2, cfg.num_layers)
    ])

    rotated_forward = make_rotated_ste_loss(params, cfg, qcfg)

    @jax.jit
    def step(R1, R2s, V1, V2s, toks, lr_t):
        loss, (g1, g2) = jax.value_and_grad(rotated_forward, argnums=(0, 1))(R1, R2s, toks)
        R1n, V1n = _sgdg_stiefel_step(R1, g1, V1, lr_t, momentum)
        R2n, V2n = jax.vmap(
            lambda r, g, v: _sgdg_stiefel_step(r, g, v, lr_t, momentum)
        )(R2s, g2, V2s)
        return loss, R1n, R2n, V1n, V2n

    V1 = jnp.zeros_like(R1)
    V2s = jnp.zeros_like(R2s)
    n = calib_tokens.shape[0]
    for it in range(n_steps):
        idx = np.arange(it * batch, (it + 1) * batch) % n
        toks = jnp.asarray(calib_tokens[idx])
        # cosine schedule over n_steps (Trainer lr_scheduler_type="cosine")
        lr_t = jnp.float32(lr * 0.5 * (1.0 + np.cos(np.pi * it / max(1, n_steps))))
        loss, R1, R2s, V1, V2s = step(R1, R2s, V1, V2s, toks, lr_t)
        if qr_period and (it + 1) % qr_period == 0:
            R1 = jnp.asarray(_qr_retract(np.asarray(R1)))
            R2s = jnp.stack([jnp.asarray(_qr_retract(np.asarray(r))) for r in R2s])
        if it % 20 == 0:
            LOGGER.info(f"SpinQuant opt step {it}: loss {float(loss):.4f}")
    return np.asarray(R1, dtype=np.float64), [np.asarray(r, np.float64) for r in R2s]


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def spinquant(params, cfg: ModelConfig, calib_tokens, qcfg: QuantConfig,
              mode: str = "hadamard", rotation_path: Optional[str] = None,
              mse: bool = False, n_steps: int = 100, seed: int = 0,
              chunk: int = 8, verbose: bool = True,
              scale_book: Optional[dict] = None) -> ModelConfig:
    """Rotate + GPTQ. Returns the (possibly untied) updated ModelConfig —
    rebind it for subsequent forwards/saves. ``scale_book`` records the
    internal GPTQ's exact (scales, zeros) so a later ``pack_model`` is
    bitwise lossless (same invariant as every other calibrated path —
    algorithms/pack.py)."""
    if cfg.arch not in ("llama",):
        raise NotImplementedError(
            f"SpinQuant supports llama-family only (reference core.py:63-71), got {cfg.arch}"
        )

    cfg = _untie(params, cfg)

    if mode == "optimize":
        R1, R2s = optimize_rotations(params, cfg, calib_tokens, qcfg,
                                     n_steps=n_steps, seed=seed)
        if rotation_path:
            save_rotations(Path(rotation_path) / "R.npz", R1, R2s)
    elif rotation_path and (Path(rotation_path) / "R.npz").is_file():
        LOGGER.info("Loading optimized rotations from R.npz")
        R1, R2s = load_rotations(Path(rotation_path) / "R.npz", cfg)
    else:
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        R1 = np.asarray(random_hadamard_matrix(cfg.hidden_size, k1), np.float64)
        R2s = [np.asarray(random_hadamard_matrix(cfg.head_dim, k), np.float64)
               for k in jax.random.split(k2, cfg.num_layers)]

    fuse_layer_norms(params, cfg)
    _rotate_params(params, cfg, R1, R2s)

    # GPTQ on the rotated model — fresh capture (embeddings changed)
    ctx = capture_layer0(params, cfg, jnp.asarray(calib_tokens), chunk=chunk)
    gptq(params, cfg, ctx, qcfg, mse=mse, verbose=verbose,
         scale_book=scale_book)
    return cfg
