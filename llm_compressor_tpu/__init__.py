"""llm_compressor_tpu — a TPU-native post-training compression + quantized
inference framework (JAX / XLA / Pallas / pjit).

Built from scratch with the capabilities of the reference llm-compressor
(PyTorch/CUDA): INT4/INT8/FP4/FP8/MX/NVFP4 quantization, RTN/SmoothQuant/
GPTQ/AWQ/AWQ+/SpinQuant/GPTAQ calibration, Magnitude/Wanda/SparseGPT/RIA
pruning, per-op profiling, mixed-precision config, perplexity evaluation and
a serving engine — re-designed TPU-first: pure functional transforms, packed
weights with Pallas dequant-matmul kernels, sharded multi-chip execution via
jax.sharding.Mesh.
"""

__version__ = "0.1.0"
