#!/usr/bin/env bash
# WikiText-2 ppl sweep: qwen2 family x pruning methods at 30% sparsity
# (reference scripts/eval_prune_qwen2.sh).
set -e
MODELS=${MODELS:-"/models/qwen-2.5-0.5b-it"}
for M in $MODELS; do
  NAME=$(basename "$M")
  for METHOD in magnitude wanda sparsegpt ria; do
    python examples/qwen2.py --model "$M" --exp "${NAME}-prune-${METHOD}" \
      --prune --prune-method "$METHOD" --sparsity 0.3 --tasks ppl
  done
done
