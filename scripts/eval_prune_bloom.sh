#!/usr/bin/env bash
# WikiText-2 ppl sweep: bloom family x pruning methods at 30% sparsity
# (reference scripts/eval_prune_bloom.sh).
set -e
MODELS=${MODELS:-"/models/bloom-560m /models/bloom-1.1b /models/bloom-1.7b /models/bloom-3b"}
for M in $MODELS; do
  NAME=$(basename "$M")
  for METHOD in magnitude wanda sparsegpt ria; do
    python examples/bloom.py --model "$M" --exp "${NAME}-prune-${METHOD}" \
      --prune --prune-method "$METHOD" --sparsity 0.3 --tasks ppl
  done
done
