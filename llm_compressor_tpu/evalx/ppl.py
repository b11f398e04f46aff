"""WikiText-2 perplexity with the reference's exact windowing semantics.

Reference: evaluation/eval.py:73-93 — non-overlapping seq_len windows over
the test token stream, per-window mean CE over the first seq_len-1 targets,
nll = loss * seq_len, ppl = exp(sum nll / (n * seq_len)). The forward + loss
is one jitted program; windows are batched.
"""

from __future__ import annotations

import sys
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.transformer import forward
from ..qformats.config import QuantConfig
from ..utils.logging import LOGGER


@partial(jax.jit, static_argnames=("cfg", "qcfg"))
def _window_nll(params, batch, *, cfg, qcfg):
    """Mean CE over the window's first T-1 positions (matches torch
    CrossEntropyLoss mean reduction in eval.py:87-89), per batch row."""
    logits = forward(params, cfg, batch, qcfg).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1, :], axis=-1)
    tgt = batch[:, 1:]
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll, axis=-1)  # (B,)


def compute_ppl(params, cfg: ModelConfig, token_stream: np.ndarray,
                seq_len: int = 2048, n_samples: Optional[int] = None,
                qcfg: Optional[QuantConfig] = None, batch_size: int = 1) -> float:
    """token_stream: (1, L) int32 full test stream."""
    total = token_stream.size // seq_len
    if n_samples is not None:
        total = min(total, n_samples)
    windows = token_stream.reshape(-1)[: total * seq_len].reshape(total, seq_len)
    nlls = []
    for i in range(0, total, batch_size):
        batch = jnp.asarray(windows[i : i + batch_size])
        nll = _window_nll(params, batch, cfg=cfg, qcfg=qcfg)
        nlls.append(np.asarray(nll) * seq_len)
    nll_sum = float(np.concatenate(nlls).sum())
    return float(np.exp(nll_sum / (total * seq_len)))


def evaluate(params, cfg: ModelConfig, tasks: str, token_stream=None,
             seq_len: int = 2048, n_samples: Optional[int] = None,
             qcfg: Optional[QuantConfig] = None, batch_size: int = 1,
             is_check_sparsity: bool = False, tokenizer_path: Optional[str] = None):
    """Task-string driver mirroring LMEvaluator.eval (eval.py:28-52):
    'ppl' runs the wikitext-2 perplexity; remaining comma-separated tasks go
    through the lm-eval harness bridge (evalx/lm_eval_bridge.py) when
    lm_eval is installed."""
    from .sparsity import check_sparsity

    results = {}
    if is_check_sparsity:
        results["sparsity"] = check_sparsity(params, cfg, verbose=True)

    task_list = [t for t in tasks.split(",") if t]
    if "ppl" in task_list:
        if token_stream is None:
            raise ValueError("ppl task needs a token_stream (get_loaders(...)[1])")
        try:
            ppl = compute_ppl(params, cfg, token_stream, seq_len, n_samples, qcfg, batch_size)
            results["ppl.wikitext2"] = ppl
            LOGGER.info(f"PPL[WIKITEXT2] : {ppl:.4f}")
        except Exception as e:  # reference records sys.maxsize on failure
            results["ppl.wikitext2"] = sys.maxsize
            LOGGER.error(e)
            raise
        task_list.remove("ppl")

    if task_list:
        from .lm_eval_bridge import eval_qa

        results.update(eval_qa(params, cfg, task_list, qcfg=qcfg,
                               tokenizer_path=tokenizer_path,
                               batch_size=batch_size, n_samples=n_samples))
    return results
