"""Exercise the lm-eval bridge (evalx/lm_eval_bridge.py) offline with a
vendored fake ``lm_eval`` module: loglikelihood / loglikelihood_rolling /
generate_until run through real jitted forwards, and the context/
continuation slicing is asserted against a hand-computed case
(reference eval.py:95-163 semantics)."""

import sys
import types
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_compressor_tpu.models import init_params, tiny_config
from llm_compressor_tpu.models.transformer import forward


def _install_fake_lm_eval():
    """Minimal lm_eval API surface: LM base class, evaluator, tasks."""
    if "lm_eval" in sys.modules:
        return sys.modules["lm_eval"]
    lm_eval = types.ModuleType("lm_eval")
    api = types.ModuleType("lm_eval.api")
    model_mod = types.ModuleType("lm_eval.api.model")

    class LM:
        def __init__(self):
            pass

    model_mod.LM = LM
    api.model = model_mod
    lm_eval.api = api

    evaluator = types.ModuleType("lm_eval.evaluator")

    def evaluate(lm, task_dict, limit=None, log_samples=False, verbosity=None):
        # drive the REAL loglikelihood path with two requests and score
        # "accuracy" from the greedy flags — enough to exercise the bridge
        name, task = next(iter(task_dict.items()))
        reqs = [SimpleNamespace(args=(c, x)) for c, x in task.samples]
        res = lm.loglikelihood(reqs)
        acc = float(np.mean([g for _, g in res]))
        return {"results": {name: {"acc,none": acc}}}

    evaluator.evaluate = evaluate
    lm_eval.evaluator = evaluator

    tasks_mod = types.ModuleType("lm_eval.tasks")

    class _FakeTask:
        def __init__(self):
            self.config = {}
            self.samples = [("the cat", " sat"), ("a dog", " ran far")]

        def set_config(self, key, value):
            self.config[key] = value

        def set_fewshot_seed(self, seed):
            self.config["fewshot_seed"] = seed

    class TaskManager:
        pass

    _made = {}

    def get_task_dict(name, tm):
        _made[name] = _FakeTask()
        return {name: _made[name]}

    tasks_mod.TaskManager = TaskManager
    tasks_mod.get_task_dict = get_task_dict
    tasks_mod._made = _made
    lm_eval.tasks = tasks_mod

    sys.modules["lm_eval"] = lm_eval
    sys.modules["lm_eval.api"] = api
    sys.modules["lm_eval.api.model"] = model_mod
    sys.modules["lm_eval.evaluator"] = evaluator
    sys.modules["lm_eval.tasks"] = tasks_mod
    return lm_eval


class FakeTokenizer:
    bos_token_id = 1
    eos_token_id = 2

    def encode(self, text):
        return [3 + (ord(c) % 60) for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(65 + (i % 26)) for i in ids)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config("llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.fixture
def lm(model, monkeypatch):
    _install_fake_lm_eval()
    import transformers

    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        staticmethod(lambda path, **kw: FakeTokenizer()))
    from llm_compressor_tpu.evalx.lm_eval_bridge import make_lm

    cfg, params = model
    return make_lm(params, cfg, "fake-path", batch_size=2), cfg, params


def _manual_ll(params, cfg, whole, cl):
    """Hand-computed continuation loglikelihood: sum over positions
    cl..len-1 of logp[pos-1][token[pos]] (the bridge's cl-1:tl-1 slice)."""
    toks = np.asarray([whole], dtype=np.int32)
    logits = np.asarray(forward(params, cfg, jnp.asarray(toks)), np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    logp = np.asarray(logp)[0]
    ll = 0.0
    greedy = True
    for pos in range(cl, len(whole)):
        ll += float(logp[pos - 1, whole[pos]])
        greedy &= int(logp[pos - 1].argmax()) == whole[pos]
    return ll, greedy


def test_loglikelihood_hand_case(lm):
    jax_lm, cfg, params = lm
    tok = FakeTokenizer()
    ctx_s, cont_s = "the cat", " sat on the mat"
    req = SimpleNamespace(args=(ctx_s, cont_s))
    (ll, greedy), = jax_lm.loglikelihood([req])

    whole = tok.encode(ctx_s + cont_s)
    cl = len(tok.encode(ctx_s))
    ll_manual, greedy_manual = _manual_ll(params, cfg, whole, cl)
    np.testing.assert_allclose(ll, ll_manual, rtol=1e-4, atol=1e-5)
    assert greedy == greedy_manual


def test_loglikelihood_batch_padding(lm):
    """Two requests of different lengths in one padded batch must score
    identically to solo evaluation (padding past tl never leaks in)."""
    jax_lm, cfg, params = lm
    reqs = [SimpleNamespace(args=("a", " bb")),
            SimpleNamespace(args=("a much longer context here", " ok"))]
    batched = jax_lm.loglikelihood(reqs)
    solo = [jax_lm.loglikelihood([r])[0] for r in reqs]
    for (bll, bg), (sll, sg) in zip(batched, solo):
        np.testing.assert_allclose(bll, sll, rtol=1e-4, atol=1e-5)
        assert bg == sg


def test_loglikelihood_rolling(lm):
    jax_lm, cfg, params = lm
    text = "roll the dice"
    (ll,) = jax_lm.loglikelihood_rolling([SimpleNamespace(args=(text,))])
    toks = FakeTokenizer().encode(text)
    ll_manual, _ = _manual_ll(params, cfg, toks, 1)
    np.testing.assert_allclose(ll, ll_manual, rtol=1e-4, atol=1e-5)


def test_generate_until(lm):
    jax_lm, cfg, params = lm
    out = jax_lm.generate_until([SimpleNamespace(args=("hi there",))])
    assert len(out) == 1 and isinstance(out[0], str)


def test_eval_qa_with_fake_harness(model, monkeypatch):
    _install_fake_lm_eval()
    import transformers

    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        staticmethod(lambda path, **kw: FakeTokenizer()))
    from llm_compressor_tpu.evalx.lm_eval_bridge import eval_qa

    cfg, params = model
    res = eval_qa(params, cfg, ["boolq"], tokenizer_path="fake-path")
    assert "boolq" in res and 0.0 <= res["boolq"] <= 100.0
    task = sys.modules["lm_eval.tasks"]._made["boolq"]
    assert task.config["num_fewshot"] == 0
    assert task.config["fewshot_seed"] == 1234

    res = eval_qa(params, cfg, ["mmlu"], tokenizer_path="fake-path")
    task = sys.modules["lm_eval.tasks"]._made["mmlu"]
    assert task.config["num_fewshot"] == 5  # mmlu is 5-shot (eval.py:99)
