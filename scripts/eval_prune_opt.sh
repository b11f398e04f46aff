#!/usr/bin/env bash
# WikiText-2 ppl sweep: opt family x pruning methods at 30% sparsity
# (reference scripts/eval_prune_opt.sh).
set -e
MODELS=${MODELS:-"/models/opt-125m /models/opt-350m /models/opt-1.3b"}
for M in $MODELS; do
  NAME=$(basename "$M")
  for METHOD in magnitude wanda sparsegpt ria; do
    python examples/opt.py --model "$M" --exp "${NAME}-prune-${METHOD}" \
      --prune --prune-method "$METHOD" --sparsity 0.3 --tasks ppl
  done
done
