#!/usr/bin/env bash
# WikiText-2 ppl sweep: gemma family x quantization methods at W4A8 G128
# (reference scripts/eval_quant_gemma.sh; method coverage per BASELINE.md).
set -e
MODELS=${MODELS:-"/models/gemma-2b-it"}
W="int4-g[128]-rw"; A="int8-g[128]-rw"
for M in $MODELS; do
  NAME=$(basename "$M")
  python examples/gemma.py --model "$M" --exp "${NAME}-bf16" --tasks ppl
  for METHOD in rtn gptq gptaq; do
    python examples/gemma.py --model "$M" --exp "${NAME}-${METHOD}" \
      --quantize --quant-method "$METHOD" --weight "$W" --act-in "$A" \
      --seq-len 512 --tasks ppl
  done
done
