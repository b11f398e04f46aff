#!/usr/bin/env bash
# Fetch the benchmark SLM checkpoints from HuggingFace (reference
# scripts/download_slm.sh). Requires network + `huggingface-cli`.
set -e
DEST=${MODEL_DIR:-/models}
mkdir -p "$DEST"
for REPO in facebook/opt-125m facebook/opt-350m facebook/opt-1.3b \
  bigscience/bloom-560m bigscience/bloom-1b1 bigscience/bloom-1b7 bigscience/bloom-3b \
  microsoft/phi-1_5 microsoft/phi-2 \
  google/gemma-2b-it google/gemma-2-2b-it google/gemma-3-1b-it google/gemma-3-4b-it \
  Qwen/Qwen2.5-0.5B-Instruct Qwen/Qwen3-1.7B Qwen/Qwen3-4B \
  meta-llama/Llama-3.2-1B-Instruct meta-llama/Llama-3.2-3B-Instruct; do
  NAME=$(basename "$REPO" | tr '[:upper:]' '[:lower:]')
  huggingface-cli download "$REPO" --local-dir "$DEST/$NAME"
done
