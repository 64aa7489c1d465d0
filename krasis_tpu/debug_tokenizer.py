"""Debug tool: inspect what the tokenizer/chat template produce on this
system (reference python/krasis/debug_tokenizer.py parity — the quick
first check when generations look wrong for a new checkpoint).

    python -m krasis_tpu.debug_tokenizer <model_path> [--prompt TEXT]

Prints environment versions, the resolved tokenizer class, whether a
chat template is present, the templated token ids, and the round-trip
decode — template bugs show up as missing role markers or a broken
round trip before any engine work is needed.
"""
from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_path")
    ap.add_argument("--prompt", default="hello")
    ap.add_argument("--thinking", action="store_true",
                    help="enable_thinking=True in the template")
    args = ap.parse_args()

    import transformers

    print("transformers:", transformers.__version__)
    print("python:", sys.version.split()[0])
    print("model_path:", args.model_path)

    from .runtime.tokenizer import Tokenizer

    tok = Tokenizer(args.model_path)
    print("tokenizer class:", type(tok.tk).__name__)
    print("vocab size:", tok.tk.vocab_size)
    print("has chat_template:", bool(getattr(tok.tk, "chat_template", None)))
    print("eos:", tok.tk.eos_token_id, repr(tok.tk.eos_token))

    ids = tok.apply_chat_template(
        [{"role": "user", "content": args.prompt}],
        enable_thinking=True if args.thinking else None,
    )
    print("templated ids:", len(ids), "tokens; first 16:", ids[:16])
    print("decoded:", repr(tok.decode(ids))[:300])

    plain = tok.encode(args.prompt)
    print("plain encode:", plain)
    print("round trip:", repr(tok.decode(plain)))


if __name__ == "__main__":
    main()
