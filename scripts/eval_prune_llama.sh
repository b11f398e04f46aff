#!/usr/bin/env bash
# WikiText-2 ppl sweep: Llama family x pruning methods at 30% sparsity.
set -e
MODELS=${MODELS:-"/models/llama-3.2-1b-it /models/llama-3.2-3b-it"}
for M in $MODELS; do
  NAME=$(basename "$M")
  for METHOD in magnitude wanda sparsegpt ria; do
    python examples/llama.py --model "$M" --exp "${NAME}-prune-${METHOD}" \
      --prune --prune-method "$METHOD" --sparsity 0.3 --tasks ppl
  done
done
