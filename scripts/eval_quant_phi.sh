#!/usr/bin/env bash
# WikiText-2 ppl sweep: phi family x quantization methods at W4A8 G128
# (reference scripts/eval_quant_phi.sh; method coverage per BASELINE.md).
set -e
MODELS=${MODELS:-"/models/phi-1.5 /models/phi-2.0"}
W="int4-g[128]-rw"; A="int8-g[128]-rw"
for M in $MODELS; do
  NAME=$(basename "$M")
  python examples/phi.py --model "$M" --exp "${NAME}-bf16" --tasks ppl
  for METHOD in rtn gptq awq awq_plus gptaq; do
    python examples/phi.py --model "$M" --exp "${NAME}-${METHOD}" \
      --quantize --quant-method "$METHOD" --weight "$W" --act-in "$A" \
      --seq-len 512 --tasks ppl
  done
done
