"""Element-wise quantization numerics (pure jnp, f32 internal math).

The numeric engine shared by the FP / MX / NVFP paths, re-designed from the
reference's element-wise core (reference: llm_compressor/quantization/
quantizers/utils.py:170-284) as branch-free jnp so it fuses into surrounding
XLA graphs (one VPU pass, no host control flow).

All rounding modes operate on the *shifted mantissa* representation: a value
is scaled so that ``mbits`` bits sit left of the binary point, rounded, and
scaled back. ``mbits`` includes the sign bit and the implicit one, matching
the reference convention (int4 -> mbits=4 -> +-7 after the 2**(mbits-2)
shift with max_norm=1.75).
"""

from __future__ import annotations

import jax.numpy as jnp

from .formats import FormatParams


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """Round to nearest, ties away from zero (reference 'nearest')."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def round_half_even(x: jnp.ndarray) -> jnp.ndarray:
    """Round to nearest, ties to even (reference 'even')."""
    absx = jnp.abs(x)
    mask = ((absx - 0.5) % 2 == 0).astype(x.dtype)  # exact .5 ties below an even
    return jnp.sign(x) * (jnp.floor(absx + 0.5) - mask)


def round_floor(x: jnp.ndarray) -> jnp.ndarray:
    """Round toward zero (reference 'floor': sign * floor(abs))."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x))


_ROUND = {
    "nearest": round_half_away,
    "even": round_half_even,
    "floor": round_floor,
}


def quantize_elemwise(
    x: jnp.ndarray,
    params: FormatParams,
    round: str = "nearest",
    saturate_normals: bool = True,
    allow_denorm: bool = True,
) -> jnp.ndarray:
    """Quantize ``x`` element-wise to the format described by ``params``.

    The input is assumed to already be scaled into the format's dynamic range
    (callers divide by the group scale first). Computation runs in float32
    and the result is cast back to ``x.dtype``. Inf/NaN pass through.
    """
    round_fn = _ROUND[round]
    dtype = x.dtype
    a = x.astype(jnp.float32)
    ebits, mbits, max_norm = params.ebits, params.mbits, params.max_norm

    out = a
    if not allow_denorm and ebits > 0:
        min_norm = 2.0 ** (2 - 2 ** (ebits - 1))
        out = jnp.where(jnp.abs(a) >= min_norm, a, 0.0)

    if ebits > 0:
        # Per-element private exponent: floor(log2(|x|)), clipped to the
        # format's minimum normal exponent so subnormals round on the
        # fixed denormal grid.
        safe = jnp.abs(a) + (a == 0).astype(jnp.float32)
        private_exp = jnp.floor(jnp.log2(safe))
        min_exp = float(-(2 ** (ebits - 1)) + 2)
        private_exp = jnp.maximum(private_exp, min_exp)
        pscale = jnp.exp2(private_exp)
        shifted = out / pscale * (2.0 ** (mbits - 2))
        rounded = round_fn(shifted)
        out = rounded * pscale / (2.0 ** (mbits - 2))
    else:
        shifted = out * (2.0 ** (mbits - 2))
        rounded = round_fn(shifted)
        out = rounded / (2.0 ** (mbits - 2))

    if saturate_normals or ebits == 0:
        out = jnp.clip(out, -max_norm, max_norm)
    else:
        out = jnp.where(jnp.abs(out) > max_norm, jnp.sign(out) * jnp.inf, out)

    # Inf/NaN passthrough (the reference preserves them explicitly).
    out = jnp.where(jnp.isfinite(a), out, a)
    return out.astype(dtype)
