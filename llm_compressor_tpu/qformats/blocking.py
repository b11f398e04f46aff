"""Group/block reshaping helpers (pure jnp, static shapes).

TPU-first re-design of the reference's block reshaping (reference:
llm_compressor/quantization/quantizers/utils.py:85-167). The semantics are
identical — pad the grouped axis with zeros to a multiple of the group size,
then split it into ``(n_groups, group)`` — but expressed as a static-shape
reshape that XLA folds into surrounding ops for free.

Group-size conventions shared across the framework (same DSL as the
reference, int_quant.py:30-40):

* ``0``   per-tensor        (one scale for the whole array)
* ``-1``  per-token         (group = entire last axis)
* ``-2``  per-channel       (group = entire second-to-last axis)
* ``> 0`` per-group         (``axes`` selects row-wise -1 / column-wise -2)

After :func:`block`, the group dimension sits at position ``axes`` (i.e. -1
for row-wise, -2 for column-wise), so reductions over ``axis=axes`` compute
per-group statistics — mirroring the reference's reduction convention.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class BlockMeta:
    """Static metadata needed to undo :func:`block`."""

    axis: int            # normalized (positive) blocked axis in the original array
    orig_len: int        # original length of that axis
    group: int           # group size actually used (resolved, > 0)
    blocked_shape: tuple  # shape after blocking


def resolve_group(group_size, axes: int, shape) -> tuple[int, int]:
    """Resolve the (group, axes) pair for an input shape.

    Returns ``(group, axes)`` with group > 0, or ``(0, axes)`` for per-tensor.
    """
    if group_size == 0:
        return 0, axes
    if group_size == -1:  # per-token: whole last axis is one group
        return shape[-1], -1
    if group_size == -2:  # per-channel: whole second-to-last axis is one group
        return shape[-2], -2
    if group_size < 0:
        raise ValueError(f"Unsupported group_size {group_size}")
    return int(group_size), axes


def block(x: jnp.ndarray, group: int, axes: int) -> tuple[jnp.ndarray, BlockMeta]:
    """Split axis ``axes`` of ``x`` into ``(n_groups, group)``.

    The grouped axis is zero-padded up to a multiple of ``group``. The group
    dimension lands at index ``axes`` of the blocked array (-1 row-wise,
    -2 column-wise), matching the reference's reduction convention.
    """
    if axes not in (-1, -2):
        raise ValueError(f"axes must be -1 (row-wise) or -2 (column-wise), got {axes}")
    axis = (x.ndim + axes) % x.ndim
    orig_len = x.shape[axis]
    pad = (-orig_len) % group
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    n = x.shape[axis] // group
    new_shape = x.shape[:axis] + (n, group) + x.shape[axis + 1 :]
    blocked = x.reshape(new_shape)
    if axes == -2:
        # Move the group dim to sit at -2 of the blocked array: for a trailing
        # matrix (..., R, C) blocked over R we get (..., R/g, g, C) and the
        # group dim is already at -2. Nothing to do — reshape above placed the
        # group dim at axis+1 which equals ndim-2 of the blocked array.
        pass
    return blocked, BlockMeta(axis=axis, orig_len=orig_len, group=group, blocked_shape=new_shape)


def unblock(y: jnp.ndarray, meta: BlockMeta) -> jnp.ndarray:
    """Inverse of :func:`block` — merge groups and strip padding."""
    shape = list(y.shape)
    merged = shape[: meta.axis] + [shape[meta.axis] * shape[meta.axis + 1]] + shape[meta.axis + 2 :]
    out = y.reshape(merged)
    if merged[meta.axis] != meta.orig_len:
        idx = [slice(None)] * out.ndim
        idx[meta.axis] = slice(0, meta.orig_len)
        out = out[tuple(idx)]
    return out
