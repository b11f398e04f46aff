#!/usr/bin/env bash
# WikiText-2 ppl sweep: gemma3 family x pruning methods at 30% sparsity
# (reference scripts/eval_prune_gemma3.sh).
set -e
MODELS=${MODELS:-"/models/gemma-3-1b-it /models/gemma-3-4b-it"}
for M in $MODELS; do
  NAME=$(basename "$M")
  for METHOD in magnitude wanda sparsegpt ria; do
    python examples/gemma3.py --model "$M" --exp "${NAME}-prune-${METHOD}" \
      --prune --prune-method "$METHOD" --sparsity 0.3 --tasks ppl
  done
done
