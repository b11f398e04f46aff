"""tinychat — interactive chat on a compressed model (reference
examples/tinychat.py): prune/quantize per the CLI flags, then chat with a
real (optionally int8) KV cache."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_chat_parser():
    from llm_compressor_tpu.cli.args import build_parser

    parser = build_parser()
    parser.add_argument("--max-new-tokens", type=int, default=100)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--top-k", type=int, default=None)
    parser.add_argument("--speculative", action="store_true",
                        help="prompt-lookup speculative decoding "
                             "(greedy-exact; used when temperature is 0)")
    parser.add_argument("--k-draft", type=int, default=4,
                        help="draft tokens per speculative verify step")
    return parser


def prepare(args):
    """Compress per the CLI flags and return the model to chat WITH — the
    compressed params, not a fresh reload (reference examples/tinychat.py:48-56
    chats with the model it just quantized)."""
    from llm_compressor_tpu.cli.main import _load_model, run_pipeline
    from llm_compressor_tpu.qformats import build_quant_config

    args.tasks = ""  # no eval in chat mode
    if args.quantize or args.prune:
        _, state = run_pipeline(args, return_state=True)
        return state["cfg"], state["params"], state["qcfg"]
    cfg, params, _ = _load_model(args)
    qcfg = build_quant_config(args.weight, args.act_in, args.act_out, args.head,
                              head_act=getattr(args, "head_act", None))
    return cfg, params, qcfg


def main():
    from llm_compressor_tpu.engine import generate_text
    from llm_compressor_tpu.utils.logging import LOGGER

    args = build_chat_parser().parse_args()
    cfg, params, qcfg = prepare(args)

    if args.model is None:
        LOGGER.error("tinychat needs --model <checkpoint with tokenizer>")
        sys.exit(1)
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    print("tinychat ready — empty line to exit")
    while True:
        try:
            prompt = input("you> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not prompt:
            break
        reply = generate_text(params, cfg, tokenizer, prompt,
                              max_new_tokens=args.max_new_tokens,
                              temperature=args.temperature, top_k=args.top_k,
                              qcfg=qcfg, quantized_kv=args.kv_quant,
                              speculative=args.speculative,
                              k_draft=args.k_draft)
        print(f"bot> {reply}")


if __name__ == "__main__":
    main()
