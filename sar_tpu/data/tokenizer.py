"""Tokenizer access.

The reference reuses Whisper's HF tokenizer via WhisperProcessor
(/root/reference/src/models/base.py:44-74); so do we for real models (it is
I/O, not compute). For hermetic tests and offline environments there is a
self-contained character tokenizer with the same surface.
"""

from __future__ import annotations

from sar_tpu.models.config import WhisperConfig


class CharTokenizer:
    """Byte-level tokenizer over a small vocab — used with `whisper-test`.

    ids 0..(n_special-1) are reserved for special tokens; bytes map to
    id = byte + n_special (mod vocab).
    """

    def __init__(self, cfg: WhisperConfig, n_special: int = 120):
        self.cfg = cfg
        self.n_special = n_special
        self.vocab_size = cfg.vocab_size

    def encode(self, text: str, language: str = "english",
               task: str = "transcribe") -> list[int]:
        body = [self.n_special + (b % (self.vocab_size - self.n_special))
                for b in text.encode("utf-8")]
        return self.cfg.prompt_ids(language, task) + body + [self.cfg.eos_token_id]

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        out = bytearray()
        for i in ids:
            i = int(i)
            if i >= self.n_special:
                out.append((i - self.n_special) % 256)
            elif not skip_special_tokens:
                out.extend(f"<|{i}|>".encode())
        return out.decode("utf-8", errors="ignore")

    def batch_decode(self, batch, skip_special_tokens: bool = True) -> list[str]:
        return [self.decode(row, skip_special_tokens) for row in batch]


def get_tokenizer(model_name: str, language: str = "hindi",
                  task: str = "transcribe"):
    """HF Whisper tokenizer for real models; CharTokenizer for whisper-test.

    Raises a clear error when the HF tokenizer needs network and none exists
    (offline CI); callers that only need token-level ops should use
    WhisperConfig.prompt_ids / decode.transcribe_tokens instead.
    """
    from sar_tpu.models.config import LANGUAGE_CODES, MODEL_CONFIGS, HF_MODEL_IDS

    if model_name == "whisper-test":
        return CharTokenizer(MODEL_CONFIGS[model_name])

    from transformers import WhisperTokenizerFast
    return WhisperTokenizerFast.from_pretrained(
        HF_MODEL_IDS.get(model_name, model_name),
        language=LANGUAGE_CODES.get(language, language), task=task)
