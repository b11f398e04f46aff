#!/usr/bin/env bash
# Full pruning sweep over every supported model family
# (reference scripts/eval_prune_total.sh).
set -e
for ARCH in opt bloom phi llama qwen2 qwen3 gemma gemma2 gemma3; do
  for M in ${MODEL_DIR:-/models}/${ARCH}*; do
    [ -d "$M" ] || continue
    NAME=$(basename "$M")
    for METHOD in magnitude wanda sparsegpt ria; do
      python "examples/${ARCH}.py" --model "$M" --exp "${NAME}-prune-${METHOD}" \
        --prune --prune-method "$METHOD" --sparsity 0.3 --tasks ppl || true
    done
  done
done
