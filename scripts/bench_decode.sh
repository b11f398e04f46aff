#!/usr/bin/env bash
# Decode-throughput benchmark (single chip): bf16 vs packed int4.
python bench.py
