"""Per-op quantization profiling -> stats.csv (MPQ data collection).

Reference: quantizers/base.py:30-113 (record_stats) driven by
CompressForCausalLM.profile (models/base.py:53-104): one weight pass + one
activation batch, each quantizer appending a CSV row with
PC99% / Max / QDQ(Max) / SQNR / ClipError / Elem / BPV. The same schema and
op naming is produced here so the reference's MPQ registry workflow
(``register_4_to_8bit`` etc. keyed by these rows) is interchangeable.
"""

from __future__ import annotations

from pathlib import Path
import jax.numpy as jnp
import numpy as np

from ..capture.pipeline import run_layer
from ..models.config import ModelConfig
from ..models.layers import qlinear
from ..models.transformer import arch_slots, layer_ops, op_names
from ..qformats.config import QuantConfig
from ..qformats.quantize import Quantizer, quantize_dequant
from ..algorithms.common import get_bias, get_weight, slot_tap
from ..utils.logging import LOGGER

KEYS = ("Op Name", "PC99%", "Max", "QDQ(Max)", "SQNR", "ClipError", "Elem", "BPV")


def _sqnr(t: np.ndarray, q: np.ndarray) -> float:
    tn = (t - t.min()) / (t.max() - t.min() + 1e-12)
    qn = (q - q.min()) / (q.max() - q.min() + 1e-12)
    return float(-10.0 * np.log10(np.mean((tn - qn) ** 2) + 1e-10))


def _pc99(t: np.ndarray) -> float:
    k = round(0.99 * (t.size - 1))
    return float(np.sort(t.ravel())[k])


def _bpv(q: Quantizer, numel: int) -> float:
    """Bits-per-value accounting (reference base.py:64-92)."""
    if q.qtype == "dummy":
        return 16.0
    gs = q.group_size
    group = gs if gs and gs > 0 else numel  # -1/-2/0 approximated by caller
    elem = 4 if q.fmt is not None and q.fmt.bits == 4 else 8
    if q.qtype == "nvfp":
        scales = 16.0 / numel + 8.0 / group
    else:
        scales = 16.0 / group
    zeros = 16.0 / group if q.zero_point else 0.0
    return elem + scales + zeros


def _row(csv_path: Path, op_name: str, q: Quantizer, x: np.ndarray, qdq: np.ndarray):
    vals = (
        op_name,
        _pc99(x),
        float(x.max()),
        float(qdq.max()),
        _sqnr(x, qdq),
        float(x.max()) - float(qdq.max()),
        x.size,
        _bpv(q, x.size),
    )
    header = "" if csv_path.exists() else (
        (("%46s," + "%14s," * (len(KEYS) - 1)) % KEYS).rstrip(",") + "\n"
    )
    with open(csv_path, "a") as f:
        f.write(header + (("%46s," + "%14.5g," * (len(vals) - 1)) % vals).rstrip(",") + "\n")


def _record(csv_path, op_name, q: Quantizer, x: jnp.ndarray):
    x32 = np.asarray(x, dtype=np.float32)
    qdq = np.asarray(quantize_dequant(q, jnp.asarray(x32))) if q.qtype != "dummy" else x32
    _row(csv_path, op_name, q, x32, qdq)


def profile_model(params, cfg: ModelConfig, qcfg: QuantConfig, tokens: np.ndarray,
                  save_path: str = "./", verbose: bool = True) -> Path:
    """Run the weight + activation profiling passes, writing stats.csv.

    ``tokens``: a single small batch (reference uses one 256-token wikitext
    sample, models/base.py:95-102).
    """
    csv_path = Path(save_path) / "stats.csv"
    LOGGER.info(f"Profiling model -> {csv_path}")

    # Weight pass
    for i, lp in enumerate(params["layers"]):
        names = op_names(cfg, i)
        for slot in arch_slots(cfg):
            q = qcfg.for_op(names[slot], "linear").weight
            _record(csv_path, f"{names[slot]}.weight", q, get_weight(lp, slot))
    hq = qcfg.head.weight
    w_head = params["lm_head"]["weight"] if "lm_head" in params else params["embed"]["weight"]
    _record(csv_path, "lm_head.weight", hq, w_head)

    # Activation pass: one batch through the decoder with taps
    from ..capture.pipeline import capture_layer0

    ctx = capture_layer0(params, cfg, jnp.asarray(tokens), chunk=tokens.shape[0])
    tap_keys = ("attn_in", "o_in", "mlp_in", "down_in", "qk_in1", "qk_in2",
                "qk_out", "sv_in1", "sv_in2", "sv_out")
    for i, lp in enumerate(params["layers"]):
        names = op_names(cfg, i)
        ops = layer_ops(cfg, qcfg, i)
        outs = None
        for _, _, y, taps in run_layer(ctx, lp, i, ops, tap_keys):
            outs = y
            for slot in arch_slots(cfg):
                op = qcfg.for_op(names[slot], "linear")
                x_in = taps[slot_tap(slot)]
                _record(csv_path, f"{names[slot]}.input", op.act_in, x_in)
                out = qlinear(x_in, get_weight(lp, slot), get_bias(lp, slot))
                _record(csv_path, f"{names[slot]}.output", op.act_out, out)
            qk = qcfg.for_op(names["qk"], "matmul")
            sv = qcfg.for_op(names["sv"], "matmul")
            _record(csv_path, f"{names['qk']}.input1", qk.act_in, taps["qk_in1"])
            _record(csv_path, f"{names['qk']}.input2",
                    qk.act_in.with_axes_flipped() if qk.act_in.eff_axes == -2 else qk.act_in,
                    taps["qk_in2"])
            _record(csv_path, f"{names['qk']}.output", qk.act_out, taps["qk_out"])
            _record(csv_path, f"{names['sv']}.input1", sv.act_in, taps["sv_in1"])
            _record(csv_path, f"{names['sv']}.input2",
                    sv.act_in.with_axes_flipped() if sv.act_in.eff_axes == -1 else sv.act_in,
                    taps["sv_in2"])
            _record(csv_path, f"{names['sv']}.output", sv.act_out, taps["sv_out"])
        ctx.hidden = outs
    return csv_path
