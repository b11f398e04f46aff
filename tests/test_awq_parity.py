"""Golden parity of the AWQ scale/clip searches against the reference.

- Clip: drives the reference's module-level ``auto_clip_layer``
  (awq/auto_clip.py:16-66) directly against our ``_clip_search_chunk``.
- Scale: the reference's ``_search_module_scale`` (awq/auto_scale.py:71-125)
  is a closure inside ``auto_scale_block``, so we re-execute its exact
  protocol in torch *with the reference's own INTQuantizer* on a single
  linear block and compare the selected per-channel scales against our
  ``_search_scale``.

Reuses the reference-import harness (loguru/utils stubs) from
test_obs_parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# importing test_obs_parity installs the reference-module stubs and exposes
# the reference INTQuantizer + _load_ref
import test_obs_parity as harness  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from llm_compressor_tpu.algorithms.awq import (  # noqa: E402
    ScalePair,
    _clip_search_chunk,
    _search_scale,
)
from llm_compressor_tpu.qformats import ElemFormat, Quantizer  # noqa: E402

INTQuantizer = harness.INTQuantizer
RefFmt = harness.RefFmt

ref_auto_clip = harness._load_ref(
    "ref_awq_auto_clip",
    harness.REF + "/quantization/calibrations/awq/auto_clip.py")


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_awq_clip_parity(rng):
    """Per-(row, group) weight-clip grid search == reference auto_clip_layer
    (same shrink grid, same subsample stride, same partial-product loss)."""
    co, ci, g, n_tok, n_sample = 64, 64, 16, 64, 16
    W = rng.normal(size=(co, ci)).astype(np.float32)
    X = rng.normal(size=(n_tok, ci)).astype(np.float32)
    X *= (1.0 + 3.0 * np.abs(rng.normal(size=(ci,)))).astype(np.float32)

    quant = INTQuantizer(format=RefFmt.int4, group_size=g, axes=-1,
                         zero_point=False)
    quant.mse = False
    lin = torch.nn.Linear(ci, co, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(W.copy()))
    lin.weight_quantizer = quant
    with torch.no_grad():
        ref_best = ref_auto_clip.auto_clip_layer(
            lin, torch.from_numpy(X.copy()), n_grid=20, max_shrink=0.5,
            n_sample_token=n_sample)
    ref_best = ref_best.squeeze(-1).numpy()  # (co, n_group)

    # same token subsampling as the reference (auto_clip.py:29)
    stride = n_tok // n_sample
    xs = X[::stride]
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=g)
    ours = np.asarray(_clip_search_chunk(
        jnp.asarray(W.reshape(co, ci // g, g)),
        jnp.asarray(xs.reshape(xs.shape[0], ci // g, g)),
        quantizer=q))
    np.testing.assert_allclose(ours, ref_best, rtol=1e-4, atol=1e-5)


def _ref_search_scale(W, b, X, quant, n_grid=20):
    """The reference _search_module_scale protocol (auto_scale.py:71-125) on
    a single-linear block, verbatim: s = mean|x|^ratio (clamped, normalized
    by sqrt(max*min)), W -> quantize(W*s)/s, MSE loss on block output."""
    xt = torch.from_numpy(X.reshape(-1, X.shape[-1]).copy())
    Wt = torch.from_numpy(W.copy())
    bt = torch.from_numpy(b.copy())
    org_out = xt @ Wt.t() + bt
    x_max = xt.abs().mean(0)

    best_error, best_scales = float("inf"), None
    for r in range(n_grid):
        ratio = r / n_grid
        scales = x_max.pow(ratio).clamp(min=1e-4).view(-1)
        scales = scales / (scales.max() * scales.min()).sqrt()
        with torch.no_grad():
            Wq = quant(Wt * scales.view(1, -1)) / scales.view(1, -1)
        out = xt @ Wq.t() + bt
        loss = (org_out - out).float().pow(2).mean().item()
        if loss < best_error:
            best_error, best_scales = loss, scales
    return best_scales.numpy()


@pytest.mark.parametrize("group_size", [-1, 16])
def test_awq_scale_parity(rng, group_size):
    co, ci = 32, 64
    W = rng.normal(size=(co, ci)).astype(np.float32)
    b = rng.normal(size=(co,)).astype(np.float32)
    X = rng.normal(size=(4, 16, ci)).astype(np.float32)
    X *= (1.0 + 5.0 * np.abs(rng.normal(size=(ci,)))).astype(np.float32)

    quant = INTQuantizer(format=RefFmt.int4, group_size=group_size, axes=-1,
                         zero_point=False)
    quant.mse = False
    ref_s = _ref_search_scale(W, b, X, quant)

    lp = {"mlp": {"down": {"weight": jnp.asarray(W), "bias": jnp.asarray(b)}}}
    pair = ScalePair("fc", "up", ("down",), "down_in", "linear")
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=group_size)
    ours = np.asarray(_search_scale(None, lp, None, pair, jnp.asarray(X),
                                    None, None, None, {"down": q}))
    np.testing.assert_allclose(ours, ref_s, rtol=1e-4, atol=1e-5)
