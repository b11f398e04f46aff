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


def test_calib_dataset_per_method(tmp_path, monkeypatch):
    """Each algorithm calibrates on the reference's corpus: pile-val for
    AWQ/AWQ+ stage-1/SmoothQuant (awq/core.py:38), C4 for Wanda/RIA/SparseGPT
    (wanda/core.py:34), wikitext-2 for GPTQ/GPTAQ and AWQ+ stage-2
    (gptq/core.py:36, awq_plus/core.py:155)."""
    import llm_compressor_tpu.cli.main as M

    assert M.CALIB_DATASET["awq"] == M.CALIB_DATASET["smoothquant"] == "pileval"
    assert (M.CALIB_DATASET["wanda"] == M.CALIB_DATASET["ria"]
            == M.CALIB_DATASET["sparsegpt"] == "c4")
    assert M.CALIB_DATASET["gptq"] == M.CALIB_DATASET["gptaq"] == "wikitext2"

    monkeypatch.chdir(tmp_path)
    calls = []
    real = M._calib_tokens

    def spy(args, cfg, dataset):
        calls.append(dataset)
        return real(args, cfg, dataset)

    monkeypatch.setattr(M, "_calib_tokens", spy)

    run_pipeline(_args("--quantize", "--quant-method", "awq",
                       "--weight", "int4-g[32]-rw"))
    assert calls == ["pileval"]

    calls.clear()
    run_pipeline(_args("--prune", "--prune-method", "wanda"))
    assert calls == ["c4"]

    calls.clear()
    run_pipeline(_args("--quantize", "--quant-method", "awq_plus",
                       "--weight", "int4-g[32]-rw"))
    assert calls == ["pileval", "wikitext2"]


def test_tinychat_serves_compressed(tmp_path, monkeypatch):
    """tinychat chats with the params the pipeline compressed — with --pack,
    the served tree holds packed QTensors (the round-1 bug reloaded a fresh
    uncompressed model; reference tinychat.py:48-56 serves the quantized one)."""
    import importlib.util
    from pathlib import Path

    monkeypatch.chdir(tmp_path)
    spec = importlib.util.spec_from_file_location(
        "tinychat_example",
        Path(__file__).resolve().parents[1] / "examples" / "tinychat.py")
    tinychat = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tinychat)

    args = tinychat.build_chat_parser().parse_args([
        "--tiny", "--arch", "llama", "--calib-num", "2", "--seq-len", "16",
        "--quantize", "--quant-method", "rtn", "--weight", "int4-g[32]-rw",
        "--pack",
    ])
    cfg, params, qcfg = tinychat.prepare(args)
    from llm_compressor_tpu.qformats import QTensor

    assert isinstance(params["layers"][0]["attn"]["q"]["weight"], QTensor)


def test_packed_save_load_roundtrip(tmp_path, monkeypatch):
    """Packed checkpoint round-trip: loaded QTensors reproduce the exact
    quantized forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llm_compressor_tpu import algorithms as alg
    from llm_compressor_tpu.models import (
        forward, init_params, save_compressed, tiny_config,
    )
    from llm_compressor_tpu.models.params import load_compressed
    from llm_compressor_tpu.qformats import build_quant_config

    cfg = tiny_config("llama", hidden_size=128, intermediate_size=256,
                      num_heads=4, num_kv_heads=4, head_dim=32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    qcfg = build_quant_config("int4-g[128]-rw", "int8-g[-1]-rw", None, None)
    alg.rtn(params, cfg, qcfg)
    alg.pack_model(params, cfg, qcfg)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 8)))
    ref = np.asarray(forward(params, cfg, toks, qcfg=qcfg))

    save_compressed(params, cfg, tmp_path / "ckpt")
    params2 = load_compressed(tmp_path / "ckpt", cfg, qcfg)
    from llm_compressor_tpu.qformats import QTensor

    assert isinstance(params2["layers"][0]["attn"]["q"]["weight"], QTensor)
    out = np.asarray(forward(params2, cfg, toks, qcfg=qcfg))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
