"""Golden parity of the OBS cores (GPTQ / SparseGPT / GPTAQ updates) against
the reference torch implementations on small random problems.

The reference modules pull in loguru/matplotlib (not installed); we stub
them before import. The update functions are driven through a fake QLinear
carrying a reference INTQuantizer — exactly how the calibration loop calls
them (gptq/core.py:129-137).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


REF = "/root/reference/llm_compressor"
QUANT = REF + "/quantization/quantizers"
if QUANT not in sys.path:
    sys.path.insert(0, QUANT)

# 1) Load ALL the reference quantizers first — they import a flat top-level
#    `utils` (the quantizers' own utils.py) which we temporarily shadow below.
import fp_quant  # noqa: E402, F401
import mx_quant  # noqa: E402, F401
import nvfp_quant  # noqa: E402, F401
from int_quant import INTQuantizer  # noqa: E402
from formats import ElemFormat as RefFmt  # noqa: E402

_flat_utils = sys.modules["utils"]


def _fake(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _NullLogger:
    def __getattr__(self, name):
        return lambda *a, **k: None


# 2) The calibration cores import `utils.general` etc. — a *package* that
#    would collide with the quantizers' flat utils module. Stub the handful
#    of symbols the update functions actually touch; the heavy data-loading
#    helpers are never called by update_weight/prune_weight.
_fake("loguru", logger=_NullLogger())
_utils_pkg = _fake("utils")
_fake("utils.general", LOGGER=_NullLogger())
_fake("utils.dataset", get_loaders=None, get_calib_dataset=None)
_fake("utils.torch_utils", cleanup_memory=lambda *a, **k: None)
_fake("utils.module", find_layers=None, get_op_by_name=None)
for sub in ("general", "dataset", "torch_utils", "module"):
    setattr(_utils_pkg, sub, sys.modules[f"utils.{sub}"])

import importlib.util  # noqa: E402


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_gptq = _load_ref("ref_gptq_core", REF + "/quantization/calibrations/gptq/core.py")
ref_sparsegpt = _load_ref("ref_sparsegpt_core", REF + "/pruning/sparsegpt/core.py")
ref_gptaq = _load_ref("ref_gptaq_core", REF + "/quantization/calibrations/gptaq/core.py")

# restore the flat quantizers utils for any later-imported quantizer module
sys.modules["utils"] = _flat_utils

import jax.numpy as jnp  # noqa: E402

from llm_compressor_tpu.qformats import ElemFormat, Quantizer  # noqa: E402
from llm_compressor_tpu.algorithms import (  # noqa: E402
    gptaq_update, gptq_update, sparsegpt_update,
)


def _make_problem(rng, n=16, c=64):
    W = rng.normal(size=(n, c)).astype(np.float32)
    X = rng.normal(size=(c, 256)).astype(np.float32)
    H = 2.0 * X @ X.T / 8  # mimic 2/n scaling
    return W, H.astype(np.float32)


class _FakeLayer(torch.nn.Module):
    def __init__(self, W, quantizer, H):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.from_numpy(W.copy()))
        self.weight_quantizer = quantizer
        self.weight_quantizer.H = torch.from_numpy(H.copy())


@pytest.mark.parametrize("group_size,actorder", [(-1, False), (-1, True), (32, False), (32, True)])
def test_gptq_update_parity(rng, group_size, actorder):
    W, H = _make_problem(rng)
    quant = INTQuantizer(format=RefFmt.int4, group_size=group_size, axes=-1, zero_point=False)
    quant.mse = False
    layer = _FakeLayer(W, quant, H)
    with torch.no_grad():
        ref_gptq.update_weight(layer, device=torch.device("cpu"), block_size=32,
                               percdamp=0.01, actorder=actorder)
    ref_Q = layer.weight.detach().numpy()

    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=group_size)
    ours = np.asarray(gptq_update(jnp.asarray(W), jnp.asarray(H), q,
                                  blocksize=32, actorder=actorder))
    # The algebra chains Cholesky + triangular inverses; tiny fp differences
    # can flip individual round decisions, so compare reconstruction-level.
    np.testing.assert_allclose(ours, ref_Q, rtol=1e-4, atol=1e-4)


def test_gptq_preserves_pruned_zeros(rng):
    W, H = _make_problem(rng)
    W[np.abs(W) < 0.3] = 0.0
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=32)
    Q = np.asarray(gptq_update(jnp.asarray(W), jnp.asarray(H), q, blocksize=32))
    assert np.all(Q[W == 0] == 0)


@pytest.mark.parametrize("group_size", [-1, 32])
def test_gptaq_update_parity(rng, group_size):
    """GPTAQ asymmetric-correction update vs the reference torch
    update_weight (gptaq/core.py:198-335): P = alpha * triu(dXXT Hinv^T, 1)
    Hinv chained into both the per-column and cross-block propagation, with
    act-order (per-group-granular for grouped quantizers)."""
    n, c = 16, 64
    W = rng.normal(size=(n, c)).astype(np.float32)
    X = rng.normal(size=(c, 256)).astype(np.float32)
    dX = 0.05 * rng.normal(size=(c, 256)).astype(np.float32)
    H = (2.0 * X @ X.T / 8).astype(np.float32)
    # fp-input cross term: dXXT = sum (x_fp - x) x^T with the same scaling
    dXXT = (2.0 * dX @ X.T / 8).astype(np.float32)

    quant = INTQuantizer(format=RefFmt.int4, group_size=group_size, axes=-1,
                         zero_point=False)
    quant.mse = False
    layer = _FakeLayer(W, quant, H)
    layer.weight_quantizer.dXXT = torch.from_numpy(dXXT.copy())
    with torch.no_grad():
        ref_gptaq.update_weight(layer, device=torch.device("cpu"),
                                block_size=32, percdamp=0.01, actorder=True,
                                alpha=0.25)
    ref_Q = layer.weight.detach().numpy()

    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=group_size)
    ours = np.asarray(gptaq_update(jnp.asarray(W), jnp.asarray(H),
                                   jnp.asarray(dXXT), q, blocksize=32,
                                   actorder=True, alpha=0.25))
    np.testing.assert_allclose(ours, ref_Q, rtol=1e-4, atol=1e-4)


def test_gptaq_preserves_pruned_zeros(rng):
    W = rng.normal(size=(16, 64)).astype(np.float32)
    W[np.abs(W) < 0.3] = 0.0
    X = rng.normal(size=(64, 256)).astype(np.float32)
    H = (2.0 * X @ X.T / 8).astype(np.float32)
    dXXT = (0.1 * rng.normal(size=(64, 64))).astype(np.float32)
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=32)
    Q = np.asarray(gptaq_update(jnp.asarray(W), jnp.asarray(H),
                                jnp.asarray(dXXT), q, blocksize=32))
    assert np.all(Q[W == 0] == 0)


def test_sparsegpt_update_parity(rng):
    W, H = _make_problem(rng)

    class _Wrap:
        pass

    # reference prune_weight(layer, ...) expects layer.module.weight and layer.H
    wrap = _Wrap()
    wrap.module = torch.nn.Linear(W.shape[1], W.shape[0], bias=False)
    with torch.no_grad():
        wrap.module.weight.copy_(torch.from_numpy(W.copy()))
    wrap.H = torch.from_numpy(H.copy())
    with torch.no_grad():
        ref_sparsegpt.prune_weight(wrap, device=torch.device("cpu"),
                                   sparsity_ratio=0.3, block_size=32, percdamp=0.01)
    ref_W = wrap.module.weight.detach().numpy()

    ours = np.asarray(sparsegpt_update(jnp.asarray(W), jnp.asarray(H), 0.3, blocksize=32))
    np.testing.assert_allclose(ours, ref_W, rtol=1e-4, atol=1e-4)
    # same sparsity pattern
    assert np.array_equal(ours == 0, ref_W == 0)


def test_gptq_better_than_rtn(rng):
    """GPTQ must beat plain RTN on the proxy objective ||X^T (W-Q)^T||^2."""
    from llm_compressor_tpu.qformats import quantize_dequant

    W = rng.normal(size=(16, 64)).astype(np.float32)
    X = rng.normal(size=(64, 512)).astype(np.float32)
    # correlated inputs make error compensation matter
    X = X + 0.8 * X[np.random.default_rng(1).permutation(64)]
    H = (2.0 * X @ X.T / 16).astype(np.float32)
    q = Quantizer(qtype="int", fmt=ElemFormat.int4, group_size=-1)
    Q_gptq = np.asarray(gptq_update(jnp.asarray(W), jnp.asarray(H), q, blocksize=32))
    Q_rtn = np.asarray(quantize_dequant(q, jnp.asarray(W)))
    err_gptq = np.linalg.norm((W - Q_gptq) @ X)
    err_rtn = np.linalg.norm((W - Q_rtn) @ X)
    assert err_gptq < err_rtn, (err_gptq, err_rtn)
