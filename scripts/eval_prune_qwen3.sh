#!/usr/bin/env bash
# WikiText-2 ppl sweep: qwen3 family x pruning methods at 30% sparsity
# (reference scripts/eval_prune_qwen3.sh).
set -e
MODELS=${MODELS:-"/models/qwen-3.0-1.7b /models/qwen-3.0-4b"}
for M in $MODELS; do
  NAME=$(basename "$M")
  for METHOD in magnitude wanda sparsegpt ria; do
    python examples/qwen3.py --model "$M" --exp "${NAME}-prune-${METHOD}" \
      --prune --prune-method "$METHOD" --sparsity 0.3 --tasks ppl
  done
done
