#!/usr/bin/env bash
# Full quantization sweep over every supported model family.
set -e
for ARCH in opt bloom phi llama qwen2 qwen3 gemma gemma2 gemma3; do
  for M in ${MODEL_DIR:-/models}/${ARCH}*; do
    [ -d "$M" ] || continue
    NAME=$(basename "$M")
    for METHOD in rtn gptq awq gptaq; do
      python "examples/${ARCH}.py" --model "$M" --exp "${NAME}-${METHOD}" \
        --quantize --quant-method "$METHOD" \
        --weight "int4-g[128]-rw" --act-in "int8-g[128]-rw" --tasks ppl || true
    done
  done
done
