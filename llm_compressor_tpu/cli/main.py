"""End-to-end pipeline driver: load -> prune -> profile -> quantize -> eval
-> save (the reference example pipeline, examples/llama.py:12-82)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..utils.logging import LOGGER, add_file_sink, init_seeds
from .args import make_exp_dir


def _load_model(args):
    import jax

    from ..models import init_params, load_hf_checkpoint, tiny_config

    if args.tiny or args.model is None:
        arch = args.arch or "llama"
        cfg = tiny_config(arch, dtype=args.dtype)
        LOGGER.info(f"Tiny random-init model: {arch}")
        return cfg, init_params(cfg, jax.random.PRNGKey(args.seed)), None
    cfg, params = load_hf_checkpoint(args.model, dtype=args.dtype)
    hf_cfg = json.loads((Path(args.model) / "config.json").read_text())
    LOGGER.info(f"Loaded {args.model}: {cfg.arch}, {cfg.num_layers} layers")
    return cfg, params, hf_cfg


def _calib_tokens(args, cfg):
    from ..utils.dataset import get_loaders, synthetic_tokens

    if args.model is not None and not args.tiny:
        name = "wikitext2"
        train, test = get_loaders(name, args.model, nsamples=args.calib_num,
                                  seqlen=args.seq_len, seed=args.seed,
                                  local_path=args.calib_dataset)
        return train, test
    LOGGER.warning("Offline mode: synthetic calibration/eval tokens")
    train = synthetic_tokens(args.calib_num, args.seq_len, cfg.vocab_size, args.seed)
    test = synthetic_tokens(1, 1, cfg.vocab_size, args.seed + 1,
                            eval_len=16 * args.seq_len)
    return train, test


def run_pipeline(args) -> dict:
    import jax.numpy as jnp

    from .. import algorithms as alg
    from ..capture import capture_layer0
    from ..evalx import evaluate, profile_model
    from ..models import save_compressed
    from ..qformats import build_quant_config

    init_seeds(args.seed)
    exp_dir = make_exp_dir(args)
    add_file_sink(exp_dir / "run.log")

    cfg, params, hf_cfg = _load_model(args)
    qcfg = build_quant_config(args.weight, args.act_in, args.act_out, args.head,
                              w_mse=args.w_clip)
    train_tokens, test_stream = _calib_tokens(args, cfg)

    def ctx():
        return capture_layer0(params, cfg, jnp.asarray(train_tokens), chunk=8)

    if args.prune:
        LOGGER.info(f"Pruning [{args.prune_method}] sparsity={args.sparsity}")
        if args.prune_method == "magnitude":
            alg.magnitude(params, cfg, args.sparsity)
        elif args.prune_method == "wanda":
            alg.wanda(params, cfg, ctx(), args.sparsity, qcfg)
        elif args.prune_method == "sparsegpt":
            alg.sparsegpt(params, cfg, ctx(), args.sparsity, qcfg)
        elif args.prune_method == "ria":
            alg.ria(params, cfg, ctx(), args.sparsity, args.ria_alpha, qcfg)

    if args.profile:
        profile_model(params, cfg, qcfg, train_tokens[:1, :256], save_path=exp_dir)
        LOGGER.info("Profiling done (stats.csv)")
        return {"stats_csv": str(exp_dir / "stats.csv")}

    scale_book: dict = {}
    if args.quantize:
        LOGGER.info(f"Quantizing [{args.quant_method}]")
        m = args.quant_method
        if m == "rtn":
            alg.rtn(params, cfg, qcfg, mse=args.w_clip, scale_book=scale_book)
        elif m == "smoothquant":
            alg.smoothquant(params, cfg, ctx(), qcfg, alpha=args.sq_alpha,
                            mse=args.w_clip, scale_book=scale_book)
        elif m == "gptq":
            alg.gptq(params, cfg, ctx(), qcfg, mse=args.w_clip, scale_book=scale_book)
        elif m == "awq":
            alg.awq(params, cfg, ctx(), qcfg, mse=args.w_clip, scale_book=scale_book)
        elif m == "awq_plus":
            alg.awq_plus(params, cfg, ctx(), ctx(), qcfg, mse=args.w_clip,
                         scale_book=scale_book)
        elif m == "gptaq":
            alg.gptaq(params, cfg, ctx(), qcfg, mse=args.w_clip, scale_book=scale_book)
        elif m in ("spinquant-had", "spinquant-opt"):
            cfg = alg.spinquant(params, cfg, train_tokens, qcfg,
                                mode="hadamard" if m == "spinquant-had" else "optimize",
                                rotation_path=args.rotation_path, mse=args.w_clip)

    results = evaluate(params, cfg, args.tasks, token_stream=test_stream,
                       seq_len=min(args.seq_len * 4, 2048) if args.tiny else 2048,
                       qcfg=qcfg, batch_size=args.batch_size,
                       is_check_sparsity=args.prune,
                       tokenizer_path=args.model)
    LOGGER.info(f"Results: {results}")
    (exp_dir / "results.json").write_text(json.dumps(results, indent=2))

    if args.pack:
        alg.pack_model(params, cfg, qcfg, scale_book=scale_book or None)
        LOGGER.info("Weights packed into QTensors")

    if args.save_path:
        save_compressed(params, cfg, args.save_path, hf_config=hf_cfg,
                        tokenizer_path=args.model)
        LOGGER.info(f"Saved compressed model -> {args.save_path}")
    return results


def main(argv=None, arch: str = None):
    from .args import build_parser

    parser = build_parser()
    args = parser.parse_args(argv)
    if arch is not None and args.arch is None:
        args.arch = arch
    return run_pipeline(args)


if __name__ == "__main__":
    main()
