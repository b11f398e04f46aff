#!/usr/bin/env bash
# WikiText-2 ppl sweep: phi family x pruning methods at 30% sparsity
# (reference scripts/eval_prune_phi.sh).
set -e
MODELS=${MODELS:-"/models/phi-1.5 /models/phi-2.0"}
for M in $MODELS; do
  NAME=$(basename "$M")
  for METHOD in magnitude wanda sparsegpt ria; do
    python examples/phi.py --model "$M" --exp "${NAME}-prune-${METHOD}" \
      --prune --prune-method "$METHOD" --sparsity 0.3 --tasks ppl
  done
done
