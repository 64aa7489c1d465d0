"""Tokenizer wrapper: HF AutoTokenizer + chat template + incremental decode.

Mirrors the reference's tokenizer layer (reference python/krasis/tokenizer.py:11):
chat-template application with optional thinking-mode flag, and an
incremental decoder that only emits text once it is prefix-stable (so
multi-byte unicode sequences stream correctly over SSE).
"""

from __future__ import annotations

from typing import List, Optional, Sequence


class Tokenizer:
    def __init__(self, model_path: str):
        from transformers import AutoTokenizer  # deferred: heavy import

        self.tk = AutoTokenizer.from_pretrained(model_path, trust_remote_code=False)

    @property
    def eos_token_id(self) -> int:
        return self.tk.eos_token_id

    def encode(self, text: str) -> List[int]:
        return self.tk.encode(text)

    def decode(self, ids: Sequence[int]) -> str:
        return self.tk.decode(ids, skip_special_tokens=False)

    def apply_chat_template(
        self,
        messages: List[dict],
        enable_thinking: Optional[bool] = None,
    ) -> List[int]:
        kwargs = dict(add_generation_prompt=True, tokenize=True)
        if enable_thinking is not None:
            kwargs["enable_thinking"] = enable_thinking
        try:
            return self.tk.apply_chat_template(messages, **kwargs)
        except TypeError:  # template without enable_thinking support
            kwargs.pop("enable_thinking", None)
            return self.tk.apply_chat_template(messages, **kwargs)


class IncrementalDecoder:
    """Streams text token-by-token, holding back bytes until stable
    (reference tokenizer.py incremental decode)."""

    def __init__(self, tokenizer: Tokenizer):
        self.tk = tokenizer
        self.ids: List[int] = []
        self.emitted = 0

    def push(self, token_id: int) -> str:
        self.ids.append(token_id)
        text = self.tk.decode(self.ids)
        # Hold back if the tail is an incomplete UTF-8 sequence (the
        # replacement char at the end signals a split codepoint).
        if text.endswith("�"):
            return ""
        delta = text[self.emitted :]
        self.emitted = len(text)
        return delta
