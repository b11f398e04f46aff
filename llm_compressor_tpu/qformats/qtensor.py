"""QTensor — real packed quantized tensors (pytree).

The reference simulates quantization by storing quantize-dequantized bf16
weights (fake quant). The TPU build goes further per the north star: weights
are stored *packed* — int4 nibbles two-per-byte, int8/fp8 one byte per value,
group scales alongside — and dequantization happens inside the matmul kernel
(see kernels/dequant_matmul.py) or via :func:`dequantize` as the XLA
reference path.

Layout conventions:
* ``codes`` keeps the logical shape of the source tensor except the *group
  axis is halved* for 4-bit formats (two values per byte). int4 defaults
  to the "pair planes" nibble layout (byte j of group pair t holds elems
  (2t*g + j, (2t+1)*g + j) — the W4A8 kernel then reads each group as a
  contiguous K=g nibble-plane slice with byte-op-only unpack, see
  :func:`_pack_nibbles_pairs`); fp4 and odd group counts keep the legacy
  "group halves" layout (byte i of a group = elems (i, i + g/2)).
* Storage is FLAT: the ``(n_groups, group)`` pair produced by blocking is
  merged back into one axis before storing — ``codes`` for a (N, C) weight
  is (N, C) int8 / (N, C/2) uint8, ``scales``/``zeros`` are (N, G). TPU
  tiles the last TWO dims of every array; a 3-D (N, G, g/2) layout puts
  tiny dims on the (sublane, lane) tiles (padding waste) and makes the
  per-matmul ``reshape`` a full relayout copy that XLA re-executes on
  every decode step (measured 7-16us per matmul,
  experiments/exp_kernel_dissect3.py). The blocked view is reconstructed
  by :func:`dequantize` from the static metadata (cold path).
* FP8 codes are stored as native ``float8_e4m3fn`` / ``float8_e5m2`` arrays
  (TPU supports these dtypes directly); FP4-E2M1 codes are 4-bit
  sign/exp/mantissa fields packed two per byte.

Padding: tensors whose group axis is not a multiple of the group size are
zero-padded at pack time (zeros survive quantization exactly) and sliced off
on dequantization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .blocking import unblock
from .formats import ElemFormat
from .numerics import quantize_elemwise
from .quantize import Quantizer, block_for, find_params_blocked

# Positive FP4-E2M1 value grid, index == 3-bit magnitude code (exp<<1 | mant).
FP4_GRID = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)


@struct.dataclass
class QTensor:
    codes: jnp.ndarray                    # packed values (uint8 / int8 / fp8)
    scales: jnp.ndarray                   # per-group scales (blocked shape)
    zeros: Optional[jnp.ndarray]          # per-group zero points (or None)
    quantizer: Quantizer = struct.field(pytree_node=False)
    shape: tuple = struct.field(pytree_node=False)        # logical shape
    blocked_shape: tuple = struct.field(pytree_node=False)
    group_axis: int = struct.field(pytree_node=False)     # intra-group axis in blocked array
    ngroups_axis: int = struct.field(pytree_node=False, default=0)  # n_groups axis in blocked array
    dtype: jnp.dtype = struct.field(pytree_node=False, default=jnp.bfloat16)
    # Pre-transposed (G, N) scale strip for 2-D row-wise-grouped weights.
    # The W4A8 kernel consumes scales as (G, N) sublane rows; transposing
    # (N, G) -> (G, N) per matmul call inside a decode scan is NOT hoisted
    # by XLA and measured 7-16us per call (experiments/
    # exp_kernel_dissect3.py) — so the strip is materialized once at
    # pack/load/fuse time and rides in the pytree (~3% of the codes' bytes).
    scales_t: Optional[jnp.ndarray] = None
    # int4 nibble layout: True = "pair planes" (byte j of group pair t holds
    # elems (2t*g + j, (2t+1)*g + j); the kernel's contiguous-dot layout,
    # round 5), False = legacy "group halves" (byte i of a group holds
    # elems (i, i + g/2); fp4/mx and odd group counts).
    pair_planes: bool = struct.field(pytree_node=False, default=False)

    @property
    def fmt(self) -> ElemFormat:
        return self.quantizer.fmt

    @property
    def nbytes(self) -> int:
        n = self.codes.size * self.codes.dtype.itemsize + self.scales.size * self.scales.dtype.itemsize
        if self.zeros is not None:
            n += self.zeros.size * self.zeros.dtype.itemsize
        return n


def _pack_nibbles(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Pack int values in [0, 15] into uint8, two per byte.

    "Group halves" layout: byte i of a group holds elements (i, i + g/2) —
    low nibble = first half, high nibble = second half. A Pallas kernel
    then unpacks with two mask/shift ops and ONE concatenate along the lane
    dimension (no stride-2 interleave, which would fight the TPU lane
    layout). Used for fp4 and for int4 tensors with an ODD group count
    (see :func:`_pack_nibbles_pairs` for the int4 default).
    """
    v = v.astype(jnp.uint8)
    n = v.shape[axis]
    assert n % 2 == 0, "group axis must be even to pack nibbles"
    lo = jax.lax.slice_in_dim(v, 0, n // 2, axis=axis)
    hi = jax.lax.slice_in_dim(v, n // 2, n, axis=axis)
    return lo | (hi << 4)


def _unpack_nibbles(p: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inverse of :func:`_pack_nibbles` (concatenates the group halves)."""
    lo = p & jnp.uint8(0x0F)
    hi = p >> 4
    return jnp.concatenate([lo, hi], axis=axis)


def _pack_nibbles_pairs(v: jnp.ndarray, ngroups_axis: int,
                        intra_axis: int) -> jnp.ndarray:
    """Pack int values in [0, 15] two per byte in the "pair planes" layout:
    byte j of group PAIR (2t, 2t+1) holds (elem j of group 2t) in the low
    nibble and (elem j of group 2t+1) in the high nibble. Flattened, pair t
    occupies g consecutive bytes: byte (t, j) = elems (2t*g + j,
    (2t+1)*g + j).

    Why (round 5): the W4A8 kernel's per-group K=g MXU dots then read a
    CONTIGUOUS K=g slice of a nibble plane — the low-nibble plane IS the
    even groups and the high plane the odd groups — so the unpack is three
    vector<u8> byte-ops (this Mosaic implements 8-bit AND/OR/XOR:
    experiments/exp_i8_ops_probe.py) with NO per-group lane concatenates
    and no int32 round-trip. The old "group halves" layout forced one
    (TN, g) concatenate per group per k-block, measured as ~60% of the
    kernel's gap to its DMA floor (experiments/exp_plane_probe.py: qkv
    15.1 -> 13.2 us/call, gateup 58.5 -> 52.7, down 38.5 -> 32.5,
    same-run). Requires an even group count along the packing axis.
    """
    v = v.astype(jnp.uint8)
    G = v.shape[ngroups_axis]
    assert G % 2 == 0, "pair-planes packing needs an even group count"
    lo = jax.lax.slice_in_dim(v, 0, G, stride=2, axis=ngroups_axis)
    hi = jax.lax.slice_in_dim(v, 1, G, stride=2, axis=ngroups_axis)
    return lo | (hi << 4)


def _unpack_nibbles_pairs(p: jnp.ndarray, ngroups_axis: int,
                          intra_axis: int) -> jnp.ndarray:
    """Inverse of :func:`_pack_nibbles_pairs`: (.., G/2, g, ..) packed ->
    (.., G, g, ..) values (interleave the even/odd group planes)."""
    lo = p & jnp.uint8(0x0F)
    hi = p >> 4
    stacked = jnp.stack([lo, hi], axis=ngroups_axis + 1)
    s = stacked.shape
    merged = s[:ngroups_axis] + (s[ngroups_axis] * 2,) + s[ngroups_axis + 2:]
    return stacked.reshape(merged)


def pair_planes_for(q: Quantizer, n_groups: int, group: int) -> bool:
    """True when a tensor packs in the "pair planes" int4 layout (the W4A8
    kernel's preferred layout, see :func:`_pack_nibbles_pairs`): symmetric
    integer int4 with an even group count. fp4/mx keep "group halves", as
    do groups too large for a whole pair to fit one kernel K-tile
    (2g > 2048 — the kernel K-tiles at <= 2048, w4a8_matmul._pick_tk)."""
    return (q.qtype == "int" and q.fmt == ElemFormat.int4
            and n_groups % 2 == 0 and 2 * group <= 2048)


def _encode_fp4(x32: jnp.ndarray) -> jnp.ndarray:
    """Encode already-quantized fp4 grid values into 4-bit codes (sign<<3|mag)."""
    sign = (x32 < 0).astype(jnp.uint8)
    mag = jnp.abs(x32)
    # Index on the FP4 grid via thresholds (midpoints are exact halves).
    grid = jnp.asarray(FP4_GRID, dtype=jnp.float32)
    idx = jnp.sum((mag[..., None] >= grid[1:]).astype(jnp.uint8), axis=-1)
    return (sign << 3) | idx


def _decode_fp4(codes4: jnp.ndarray) -> jnp.ndarray:
    """Decode 4-bit fp4 codes to f32 values. Branch-free arithmetic decode
    (no gather — TPU-friendly): value = (mant/2 or +1) * 2**(exp-1)."""
    c = codes4.astype(jnp.int32)
    sign = jnp.where(c & 8 != 0, -1.0, 1.0)
    exp = (c >> 1) & 3
    mant = (c & 1).astype(jnp.float32)
    sub = 0.5 * mant                                  # exp==0: {0, 0.5}
    norm = (1.0 + 0.5 * mant) * jnp.exp2(exp.astype(jnp.float32) - 1.0)
    return sign * jnp.where(exp == 0, sub, norm)


def quantize_pack(q: Quantizer, x: jnp.ndarray, scales=None, zeros=None) -> QTensor:
    """Quantize ``x`` into a packed :class:`QTensor`.

    When ``scales`` is None the group parameters are solved from ``x``
    (absmax / min-max / MSE-clip per the quantizer spec).
    """
    dtype = x.dtype
    xb, meta, axes = block_for(q, x)
    if meta is None:
        raise NotImplementedError("per-tensor packing: use group_size=-1/-2/N")
    if scales is None:
        scales, zeros = find_params_blocked(q, xb, axes)
    x32 = xb.astype(jnp.float32)
    p = q.params
    # position of the intra-group axis in the blocked array; the n_groups
    # axis produced by block() always directly precedes it (blocking.py).
    intra_axis = axes % xb.ndim

    pairs = pair_planes_for(q, xb.shape[meta.axis], xb.shape[intra_axis])
    if q.qtype == "int":
        qmax = float(p.int_max)
        z = zeros if zeros is not None else 0.0
        qv = jnp.clip(jnp.round(x32 / scales + z), -qmax, qmax)
        if q.fmt == ElemFormat.int8:
            codes = qv.astype(jnp.int8)
        elif pairs:  # int4: bias by +8 into [1, 15], pack as pair planes
            codes = _pack_nibbles_pairs((qv + 8.0).astype(jnp.uint8),
                                        meta.axis, intra_axis)
        else:  # int4, odd group count: bias by +8, pack group halves
            codes = _pack_nibbles((qv + 8.0).astype(jnp.uint8), intra_axis)
    elif q.qtype in ("fp", "mx", "nvfp"):
        z = zeros if zeros is not None else 0.0
        scaled = (x32 - z) / scales
        qv = quantize_elemwise(scaled, p, round="nearest", saturate_normals=True)
        if q.fmt == ElemFormat.fp8_e4m3:
            codes = qv.astype(jnp.float8_e4m3fn)
        elif q.fmt == ElemFormat.fp8_e5m2:
            codes = qv.astype(jnp.float8_e5m2)
        elif q.fmt == ElemFormat.fp4_e2m1:
            codes = _pack_nibbles(_encode_fp4(qv), intra_axis)
        else:  # mx-int4/int8: integer grid in [-max_norm, max_norm] * 2**(mbits-2)
            iv = qv * 2.0 ** (p.mbits - 2)
            if q.fmt == ElemFormat.int8:
                codes = iv.astype(jnp.int8)
            else:
                codes = _pack_nibbles((iv + 8.0).astype(jnp.uint8), intra_axis)
    else:
        raise ValueError(f"cannot pack qtype {q.qtype}")

    scales32 = scales.astype(jnp.float32)
    zeros32 = (None if zeros is None or (q.qtype == "int" and not q.zero_point)
               else jnp.asarray(zeros, jnp.float32))
    a = meta.axis  # n_groups axis; intra axis is a+1 (blocking.py)
    return QTensor(
        codes=_flatten_groups(codes, a),
        scales=_flatten_groups(scales32, a),
        zeros=None if zeros32 is None else _flatten_groups(zeros32, a),
        quantizer=q,
        shape=tuple(x.shape),
        blocked_shape=tuple(xb.shape),
        group_axis=intra_axis,
        ngroups_axis=meta.axis,
        dtype=dtype,
        scales_t=scale_strip(q, tuple(x.shape), scales32),
        pair_planes=pairs,
    )


def _flatten_groups(arr: jnp.ndarray, a: int) -> jnp.ndarray:
    """Merge the (n_groups, group) axis pair (a, a+1) into one flat axis."""
    s = arr.shape
    return arr.reshape(s[:a] + (s[a] * s[a + 1],) + s[a + 2:])


def scale_strip(q: Quantizer, shape: tuple, scales: jnp.ndarray):
    """(G, N) transposed scale strip for 2-D row-wise-grouped symmetric int
    tensors (the W4A8 kernel's eligible set); None otherwise."""
    if (len(shape) == 2 and q.eff_axes == -1 and q.qtype == "int"
            and q.fmt in (ElemFormat.int4, ElemFormat.int8)
            and not q.zero_point):
        N = shape[0]
        if scales.size % N == 0:
            return scales.reshape(N, scales.size // N).T
    return None


def to_group_halves(qt: QTensor) -> QTensor:
    """Convert a pair-planes int4 QTensor to the legacy "group halves"
    layout (same values, byte permutation only). Used when a row-parallel
    shard would leave an ODD local group count — the pair layout cannot be
    byte-sliced at an odd group boundary, so such tensors are converted
    before sharding and run the kernels' legacy unpack path."""
    if not qt.pair_planes:
        return qt
    # Operate on the LAST axis (the flat packed group axis for the 2-D
    # row-wise tensors that pair-pack) so stacked serving forms
    # (L, N, C/2) convert too.
    cs = qt.codes.shape
    G = qt.scales.shape[-1]
    gp = cs[-1] // G                     # packed bytes per group (= g/2)
    a = len(cs) - 1                      # pair axis in the blocked view
    pb = qt.codes.reshape(cs[:-1] + (G // 2, 2 * gp))
    vals = _unpack_nibbles_pairs(pb, a, a + 1)          # biased [1,15]
    legacy = _pack_nibbles(vals, a + 1)                 # (.., G, gp)
    return qt.replace(codes=legacy.reshape(cs), pair_planes=False)


def dequantize(qt: QTensor) -> jnp.ndarray:
    """XLA reference dequantization path (kernels fuse this into the matmul).

    Storage is flat; the blocked (n_groups, group) view is reconstructed
    here from the *arrays* (inside a shard_map body the leaves are local
    shards and the static global metadata must not be trusted)."""
    q = qt.quantizer
    p = q.params
    a = qt.ngroups_axis
    intra = qt.group_axis  # == a + 1 in the blocked view
    packed4 = q.fmt in (ElemFormat.int4, ElemFormat.fp4_e2m1)

    ss = qt.scales.shape
    G = ss[a]
    cs = qt.codes.shape
    gp = cs[a] // G                                   # packed intra length
    codes_b = qt.codes.reshape(cs[:a] + (G, gp) + cs[a + 1:])
    scales_b = qt.scales.reshape(ss[:a] + (G, 1) + ss[a + 1:])
    zeros_b = (None if qt.zeros is None
               else qt.zeros.reshape(ss[:a] + (G, 1) + ss[a + 1:]))

    if q.qtype == "int":
        if q.fmt == ElemFormat.int8:
            qv = codes_b.astype(jnp.float32)
        elif qt.pair_planes:
            pb = qt.codes.reshape(cs[:a] + (G // 2, 2 * gp) + cs[a + 1:])
            qv = (_unpack_nibbles_pairs(pb, a, intra).astype(jnp.float32)
                  - 8.0)
        else:
            qv = _unpack_nibbles(codes_b, intra).astype(jnp.float32) - 8.0
        z = zeros_b if zeros_b is not None else 0.0
        vals = (qv - z) * scales_b
    else:
        if q.fmt in (ElemFormat.fp8_e4m3, ElemFormat.fp8_e5m2):
            qv = codes_b.astype(jnp.float32)
        elif q.fmt == ElemFormat.fp4_e2m1:
            qv = _decode_fp4(_unpack_nibbles(codes_b, intra))
        else:  # mx int grid
            if q.fmt == ElemFormat.int8:
                qv = codes_b.astype(jnp.float32) / 2.0 ** (p.mbits - 2)
            else:
                qv = (_unpack_nibbles(codes_b, intra).astype(jnp.float32) - 8.0) / 2.0 ** (p.mbits - 2)
        z = zeros_b if zeros_b is not None else 0.0
        vals = qv * scales_b + z

    # Unblock: merge (n_groups, group) and strip padding back to logical
    # shape (padding only exists when the logical axis wasn't a group
    # multiple; padded tensors are never sharded, so static metadata is
    # safe there).
    import math

    from .blocking import BlockMeta

    padded = math.prod(qt.blocked_shape) != math.prod(qt.shape)
    blocked = cs[:a] + (G, gp * (2 if packed4 else 1)) + cs[a + 1:]
    orig_len = (qt.shape[a] if padded else blocked[a] * blocked[a + 1])
    meta = BlockMeta(
        axis=a,
        orig_len=orig_len,
        group=blocked[intra],
        blocked_shape=blocked,
    )
    return unblock(vals.reshape(blocked), meta).astype(qt.dtype)
