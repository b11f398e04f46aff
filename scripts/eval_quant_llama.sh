#!/usr/bin/env bash
# WikiText-2 ppl sweep: Llama family x quantization methods at W4A8 G128
# (the reference benchmark configuration, see BASELINE.md).
set -e
MODELS=${MODELS:-"/models/llama-3.2-1b-it /models/llama-3.2-3b-it"}
W="int4-g[128]-rw"; A="int8-g[128]-rw"
for M in $MODELS; do
  NAME=$(basename "$M")
  python examples/llama.py --model "$M" --exp "${NAME}-bf16" --tasks ppl
  for METHOD in rtn smoothquant gptq awq awq_plus spinquant-had gptaq; do
    python examples/llama.py --model "$M" --exp "${NAME}-${METHOD}" \
      --quantize --quant-method "$METHOD" --weight "$W" --act-in "$A" \
      --seq-len 512 --tasks ppl
  done
done
