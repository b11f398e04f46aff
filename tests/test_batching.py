"""Continuous batching: per-request outputs must equal standalone greedy
generation, with requests of different lengths interleaved."""

import numpy as np
import jax
import pytest

from llm_compressor_tpu.engine import ContinuousBatcher, generate
from llm_compressor_tpu.models import init_params, tiny_config


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config("llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_matches_standalone_greedy(model):
    cfg, params = model
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, (t,)).astype(np.int32)
               for t in (5, 9, 13)]
    new = 6

    expected = {}
    for i, p in enumerate(prompts):
        out = generate(params, cfg, p[None, :], max_new_tokens=new)
        expected[i + 1] = out[0, len(p):]

    eng = ContinuousBatcher(params, cfg, batch_slots=2, max_len=64)
    for p in prompts:
        eng.submit(p, max_new_tokens=new)
    results = eng.run()

    assert set(results) == set(expected)
    for uid, toks in expected.items():
        np.testing.assert_array_equal(results[uid], toks, err_msg=f"req {uid}")


def test_more_requests_than_slots(model):
    cfg, params = model
    rng = np.random.default_rng(1)
    eng = ContinuousBatcher(params, cfg, batch_slots=2, max_len=64)
    uids = [eng.submit(rng.integers(0, cfg.vocab_size, (4 + i,)).astype(np.int32),
                       max_new_tokens=3) for i in range(5)]
    results = eng.run()
    assert set(results) == set(uids)
    assert all(len(v) == 3 for v in results.values())


def test_quantized_kv_batching(model):
    cfg, params = model
    rng = np.random.default_rng(2)
    eng = ContinuousBatcher(params, cfg, batch_slots=2, max_len=64,
                            quantized_kv=True)
    eng.submit(rng.integers(0, cfg.vocab_size, (6,)).astype(np.int32),
               max_new_tokens=4)
    results = eng.run()
    assert len(results) == 1 and len(list(results.values())[0]) == 4
