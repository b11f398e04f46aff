#!/usr/bin/env bash
# WikiText-2 ppl sweep: bloom family x quantization methods at W4A8 G128
# (reference scripts/eval_quant_bloom.sh; method coverage per BASELINE.md).
set -e
MODELS=${MODELS:-"/models/bloom-560m /models/bloom-1.1b /models/bloom-1.7b /models/bloom-3b"}
W="int4-g[128]-rw"; A="int8-g[128]-rw"
for M in $MODELS; do
  NAME=$(basename "$M")
  python examples/bloom.py --model "$M" --exp "${NAME}-bf16" --tasks ppl
  for METHOD in rtn smoothquant gptq awq awq_plus gptaq; do
    python examples/bloom.py --model "$M" --exp "${NAME}-${METHOD}" \
      --quantize --quant-method "$METHOD" --weight "$W" --act-in "$A" \
      --seq-len 512 --tasks ppl
  done
done
