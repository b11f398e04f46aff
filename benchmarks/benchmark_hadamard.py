"""Fast-Hadamard-transform benchmark: Pallas kernel vs XLA vs memcpy bound
(the TPU counterpart of the reference's CUDA-kernel benchmark,
third_party/fast-hadamard-transform/benchmarks/)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from llm_compressor_tpu.kernels.hadamard import (
    hadamard_transform,
    hadamard_transform_pallas,
)


def bench(dim: int, rows: int = 4096, iters: int = 50):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(rows, dim)), jnp.bfloat16)
    copy = jax.jit(lambda v: v * 1.0)
    results = {}
    for name, fn in (("memcpy", copy),
                     ("xla", jax.jit(hadamard_transform)),
                     ("pallas", jax.jit(hadamard_transform_pallas))):
        fn(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(x)
        y.block_until_ready()
        results[name] = (time.perf_counter() - t0) / iters
    ratio_x = results["xla"] / results["memcpy"]
    ratio_p = results["pallas"] / results["memcpy"]
    print(f"dim={dim:6d}  memcpy {results['memcpy']*1e6:8.1f}us  "
          f"xla {ratio_x:5.2f}x  pallas {ratio_p:5.2f}x  (vs memcpy)")


if __name__ == "__main__":
    for d in (128, 256, 512, 1024, 2048, 2560, 3072, 4096, 8192):
        try:
            bench(d)
        except ValueError as e:
            print(f"dim={d}: {e}")
