"""Compression pipeline for qwen2-family checkpoints.

Mirrors the reference per-model example (reference examples/qwen2.py):
  python examples/qwen2.py --model <ckpt> --quantize --quant-method gptq \
      --weight int4-g[128]-rw --act-in int8-g[-1]-rw --tasks ppl
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from llm_compressor_tpu.cli.main import main

if __name__ == "__main__":
    main(arch="qwen2")
