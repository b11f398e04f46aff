#!/usr/bin/env bash
# WikiText-2 ppl sweep: gemma3 family x quantization methods at W4A8 G128
# (reference scripts/eval_quant_gemma3.sh; method coverage per BASELINE.md).
set -e
MODELS=${MODELS:-"/models/gemma-3-1b-it /models/gemma-3-4b-it"}
W="int4-g[128]-rw"; A="int8-g[128]-rw"
for M in $MODELS; do
  NAME=$(basename "$M")
  python examples/gemma3.py --model "$M" --exp "${NAME}-bf16" --tasks ppl
  for METHOD in rtn gptq awq awq_plus gptaq; do
    python examples/gemma3.py --model "$M" --exp "${NAME}-${METHOD}" \
      --quantize --quant-method "$METHOD" --weight "$W" --act-in "$A" \
      --seq-len 512 --tasks ppl
  done
done
