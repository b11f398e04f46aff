"""CLI pipeline smoke tests (tiny offline models)."""

import json
import sys

import pytest

from llm_compressor_tpu.cli.args import build_parser
from llm_compressor_tpu.cli.main import run_pipeline


def _args(*extra):
    return build_parser().parse_args([
        "--tiny", "--arch", "llama", "--calib-num", "4", "--seq-len", "32",
        "--tasks", "ppl", *extra,
    ])


def test_rtn_pipeline(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    r = run_pipeline(_args("--quantize", "--quant-method", "rtn",
                           "--weight", "int4-g[32]-rw"))
    assert "ppl.wikitext2" in r and r["ppl.wikitext2"] > 0
    assert (tmp_path / "experiments/exp/results.json").exists()


def test_prune_pipeline(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    r = run_pipeline(_args("--prune", "--prune-method", "magnitude",
                           "--sparsity", "0.3"))
    assert 0.25 < r["sparsity"] < 0.35


def test_profile_pipeline(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    r = run_pipeline(_args("--profile", "--weight", "int4-g[32]-rw",
                           "--act-in", "int8-g[-1]-rw"))
    csv = tmp_path / "experiments/exp/stats.csv"
    assert csv.exists()
    lines = csv.read_text().strip().splitlines()
    assert lines[0].split(",")[0].strip() == "Op Name"
    # weight rows + activation rows for a 2-layer gated llama + lm_head
    assert len(lines) > 20


def test_save_and_reload(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run_pipeline(_args("--quantize", "--quant-method", "rtn",
                       "--weight", "int8-g[-2]-cw",
                       "--save-path", str(tmp_path / "out")))
    from safetensors.numpy import load_file

    sd = load_file(str(tmp_path / "out/model.safetensors"))
    assert "model.layers.0.self_attn.q_proj.weight" in sd
    assert "model.embed_tokens.weight" in sd
