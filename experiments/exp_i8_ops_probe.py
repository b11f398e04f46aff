"""Probe which 8-bit elementwise ops THIS Mosaic/libtpu implements.

CLAUDE.md records subi/shifts on vector<i8|i16> as unimplemented, forcing
the w4a8 kernel's nibble unpack through int32 (the kernel's binding cost:
~208 GB/s-packed, compute-bound). If bitwise AND / OR / compare / select
lower natively on vector<i8>, parts of the unpack can skip the round-trip.
Each candidate compiles a tiny standalone pallas kernel; failures are
caught and reported (compile errors happen at trace/lower time).
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.integers(0, 256, (256, 256)).astype(np.uint8))
    Pi = P.astype(jnp.int8)  # host-side reinterpret

    cases = {
        "and_u8": lambda p: p & 0xF,
        "or_u8": lambda p: p | 0x10,
        "xor_u8": lambda p: p ^ 0xFF,
        "shr_u8": lambda p: p >> 4,
        "sub_u8": lambda p: p - jnp.uint8(8),
        "add_u8": lambda p: p + jnp.uint8(3),
        "cmp_sel_u8": lambda p: jnp.where(p >= 128, p, jnp.uint8(0)),
        "bitcast_u8_i8": lambda p: jax.lax.bitcast_convert_type(p, jnp.int8),
        "cvt_u8_f32_mul": lambda p: (p.astype(jnp.float32) * 0.0625)
        .astype(jnp.int32).astype(jnp.uint8),
        "and_i8_signed": None,  # filled below (int8 input)
    }

    def probe(name, fn, x):
        def kern(x_ref, o_ref):
            o_ref[...] = fn(x_ref[...]).astype(x_ref.dtype)

        try:
            y = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                interpret=jax.default_backend() != "tpu",
            )(x)
            y.block_until_ready()
            ref = fn(x)  # plain XLA oracle
            ok = bool(jnp.all(y == ref.astype(x.dtype)))
            print(f"{name:16s} OK   (matches XLA: {ok})", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:140]
            print(f"{name:16s} FAIL {type(e).__name__}: {msg}", flush=True)

    for name, fn in cases.items():
        if fn is None:
            continue
        probe(name, fn, P)
    probe("and_i8_signed", lambda p: p & 0xF, Pi)
    probe("shr_i8_arith", lambda p: p >> 4, Pi)


if __name__ == "__main__":
    main()
