"""Quantization-config DSL and per-op-class config slots.

Same compact string DSL as the reference CLI (reference: llm_compressor/
utils/parser.py:61-108): ``<fmt>-g[<gs>]-[zp-]<rw|cw>``, e.g.

    int4-g[128]-rw        INT4, groups of 128 along rows, symmetric
    int8-g[-1]-rw         INT8 per-token dynamic
    fp8_e4m3-g[0]-rw      FP8 per-tensor
    mxint4-g[32]-rw       OCP MX (shared exponent), int4 elements
    nvfp4_e2m1-g[16]-zp-rw  NVFP4 two-level scales, asymmetric

Parsed into immutable :class:`Quantizer` specs grouped into the same three
op-class slots the reference uses (linear / matmul / head, parser.py:26-47),
plus the mixed-precision override registry keyed by op names from profiling
(parser.py:110-222).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace
from typing import Dict, Optional

from .formats import ElemFormat
from .quantize import Quantizer

_PATTERN = re.compile(
    r"(?P<format>[^-]+)"
    r"-g\[(?P<group>-?\d+)\]"
    r"-(?:(?P<zp>zp)-)?"
    r"(?P<wise>rw|cw)$"
)


def parse_qspec(s: Optional[str], mse: bool = False) -> Quantizer:
    """Parse one DSL string into a :class:`Quantizer` (None -> dummy)."""
    if s is None or s in ("", "none", "None"):
        return Quantizer(qtype="dummy")
    m = _PATTERN.match(s)
    if not m:
        raise ValueError(f"Cannot parse quant config {s!r} "
                         "(expected e.g. 'int4-g[128]-zp-rw')")
    fmt_str = m.group("format")
    if fmt_str.startswith("mx"):
        qtype, fmt_str = "mx", fmt_str[2:]
    elif fmt_str.startswith("nvfp"):
        qtype, fmt_str = "nvfp", fmt_str[2:]  # nvfp4_e2m1 -> fp4_e2m1
    elif fmt_str.startswith("fp"):
        qtype = "fp"
    elif fmt_str.startswith("int"):
        qtype = "int"
    else:
        raise ValueError(f"Invalid format {fmt_str!r} in {s!r}")
    # Accept shorthand: int4 / int8 / fp4 / fp8 aliases
    alias = {"fp4": "fp4_e2m1", "fp8": "fp8_e4m3"}
    fmt = ElemFormat.from_any(alias.get(fmt_str, fmt_str))
    return Quantizer(
        qtype=qtype,
        fmt=fmt,
        group_size=int(m.group("group")),
        axes=-1 if m.group("wise") == "rw" else -2,
        zero_point=m.group("zp") == "zp",
        mse=mse,
    )


@dataclass(frozen=True)
class OpQuantConfig:
    """Quantizers for one op class (weight + input/output activations)."""

    weight: Quantizer = Quantizer(qtype="dummy")
    act_in: Quantizer = Quantizer(qtype="dummy")
    act_out: Quantizer = Quantizer(qtype="dummy")


@dataclass(frozen=True)
class QuantConfig:
    """Full quantization plan: per-op-class slots + per-op MPQ overrides.

    ``linear`` covers every projection in the decoder stack, ``matmul`` the
    two activation-activation matmuls inside attention (QK^T and SV — this is
    where KV quantization lives), ``head`` the lm_head
    (reference parser.py:26-47).
    """

    linear: OpQuantConfig = OpQuantConfig()
    matmul: OpQuantConfig = OpQuantConfig()
    head: OpQuantConfig = OpQuantConfig()
    overrides: Dict[str, OpQuantConfig] = field(default_factory=dict)

    def for_op(self, op_name: str, op_class: str = "linear") -> OpQuantConfig:
        """Resolve the effective config for a named op (MPQ-aware)."""
        if op_name in self.overrides:
            return self.overrides[op_name]
        return getattr(self, op_class)

    def __hash__(self):  # overrides dict keeps this unhashable by default
        return hash((self.linear, self.matmul, self.head, tuple(sorted(self.overrides.items(), key=lambda kv: kv[0]))))


def build_quant_config(
    weight: Optional[str] = None,
    act_in: Optional[str] = None,
    act_out: Optional[str] = None,
    head: Optional[str] = None,
    w_mse: bool = False,
    head_act: Optional[str] = None,
) -> QuantConfig:
    """Build the three-slot config from CLI-style DSL strings.

    ``w_mse`` enables the MSE clip grid search on weight quantizers only
    (the reference's ``--w-clip``). ``head_act`` (beyond the reference,
    whose head quant is weight-only) adds an input-activation quantizer on
    the lm_head: with int8 per-token acts the packed head executes through
    the integer W4A8 kernel instead of the dequantize-to-bf16 kernel —
    measured 1.7x faster on the flagship's 128k-row int8 head
    (experiments/exp_head_budget.py) — and the fake-quant eval path applies
    the same quantizer, so evaluation measures exactly what serving runs."""
    w = parse_qspec(weight, mse=w_mse)
    ai = parse_qspec(act_in)
    ao = parse_qspec(act_out)
    return QuantConfig(
        linear=OpQuantConfig(weight=w, act_in=ai, act_out=ao),
        matmul=OpQuantConfig(weight=Quantizer(qtype="dummy"), act_in=ai, act_out=ao),
        head=OpQuantConfig(weight=parse_qspec(head, mse=w_mse),
                           act_in=parse_qspec(head_act)),
    )


# ---------------------------------------------------------------------------
# Mixed-precision (MPQ) override registry — reference parser.py:110-222
# ---------------------------------------------------------------------------


def _bump_fmt_up(qz: Quantizer) -> Quantizer:
    if qz.qtype == "dummy" or qz.fmt is None:
        return qz
    name = qz.fmt.value
    if name.startswith("int"):
        return replace(qz, fmt=ElemFormat.int8)
    if name.startswith("fp4"):
        return replace(qz, fmt=ElemFormat.fp8_e4m3)
    return qz


def _bump_fmt_down(qz: Quantizer) -> Quantizer:
    if qz.qtype == "dummy" or qz.fmt is None:
        return qz
    name = qz.fmt.value
    if name.startswith("int"):
        return replace(qz, fmt=ElemFormat.int4)
    if name.startswith("fp8"):
        return replace(qz, fmt=ElemFormat.fp4_e2m1)
    return qz


def _strip_suffix(name: str, suffix: str) -> str:
    return name[: -len(suffix)] if name.endswith(suffix) else name


def register_4_to_8bit(cfg: QuantConfig, layer_names) -> QuantConfig:
    """Promote the *weights* of the named ops to 8-bit (sensitive layers
    identified by profiling). Names end with '.weight'."""
    overrides = dict(cfg.overrides)
    for name in layer_names:
        if "weight" not in name:
            continue
        op = _strip_suffix(name, ".weight")
        base = overrides.get(op, cfg.linear)
        overrides[op] = replace(base, weight=_bump_fmt_up(base.weight))
    return replace(cfg, overrides=overrides)


def register_8_to_4bit(cfg: QuantConfig, layer_names) -> QuantConfig:
    """Demote the named *activations* to 4-bit (robust layers). Names end
    with '.input' or '.output'; matmul ops contain 'matmul'."""
    overrides = dict(cfg.overrides)
    for name in layer_names:
        is_matmul = "matmul" in name
        if name.endswith(".input"):
            op, slot = _strip_suffix(name, ".input"), "act_in"
        elif name.endswith(".output"):
            op, slot = _strip_suffix(name, ".output"), "act_out"
        else:
            continue
        base = overrides.get(op, cfg.matmul if is_matmul else cfg.linear)
        overrides[op] = replace(base, **{slot: _bump_fmt_down(getattr(base, slot))})
    return replace(cfg, overrides=overrides)


def register_org_config(cfg: QuantConfig, layer_names) -> QuantConfig:
    """Disable quantization for the named activations (keep original dtype)."""
    overrides = dict(cfg.overrides)
    for name in layer_names:
        is_matmul = "matmul" in name
        if name.endswith(".input"):
            op, slot = _strip_suffix(name, ".input"), "act_in"
        elif name.endswith(".output"):
            op, slot = _strip_suffix(name, ".output"), "act_out"
        else:
            continue
        base = overrides.get(op, cfg.matmul if is_matmul else cfg.linear)
        overrides[op] = replace(base, **{slot: Quantizer(qtype="dummy")})
    return replace(cfg, overrides=overrides)
