"""High-level WhisperLoRA handle — the user-facing model abstraction.

Capability parity with /root/reference/src/models/whisper_lora.py: a single
object bundling base model + adapter + tokenizer with forward / generate /
save_adapter / load_adapter / merge_and_unload, plus the factory
create_whisper_lora (:253) and load_whisper_lora_from_checkpoint (:283).
Unlike the reference's checkpoint loader — which builds the wrapper via
__new__ skipping __init__ (:316-321, leaving a half-initialized object) —
this one returns a fully constructed handle.

The handle is a convenience shell: all compute goes through the functional
APIs (sar_tpu.models.whisper, sar_tpu.decode), which is what the trainer and
evaluator use directly.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp

from sar_tpu.data.tokenizer import get_tokenizer
from sar_tpu.decode import greedy_decode, transcribe_tokens
from sar_tpu.models import lora as lora_lib
from sar_tpu.models import whisper
from sar_tpu.models.base import load_base_model
from sar_tpu.models.config import WhisperConfig

logger = logging.getLogger(__name__)


class WhisperLoRA:
    """Base Whisper + one LoRA adapter (or bank), ready to train/transcribe."""

    def __init__(self, cfg: WhisperConfig, base_params: dict, lora: dict,
                 lora_cfg: lora_lib.LoraConfig, tokenizer=None,
                 language: str = "hindi"):
        self.cfg = cfg
        self.base_params = base_params
        self.lora = lora
        self.lora_cfg = lora_cfg
        self.tokenizer = tokenizer
        self.language = language
        summary = lora_lib.trainable_summary(lora, base_params)
        logger.info("WhisperLoRA: %.3f%% trainable (%d of %d params)",
                    summary["trainable_percent"], summary["trainable_params"],
                    summary["total_params"])

    # -- compute -----------------------------------------------------------
    def forward(self, mel: jnp.ndarray, labels: jnp.ndarray) -> dict:
        """Teacher-forced forward -> {"logits", "loss"}."""
        dec_in = whisper.shift_tokens_right(labels, self.cfg.sot_token_id,
                                            self.cfg.pad_token_id)
        logits = whisper.forward(self.base_params, mel, dec_in, self.cfg,
                                 lora=self.lora, lora_scale=self.lora_cfg.scale)
        return {"logits": logits,
                "loss": whisper.cross_entropy_loss(logits, labels)}

    def generate(self, mel: jnp.ndarray, max_new_tokens: int = 256,
                 num_beams: int = 1, language: str | None = None) -> jnp.ndarray:
        """Batched transcription token ids (greedy default, parity with
        whisper_lora.py:145-186)."""
        language = language or self.language
        prompt = jnp.asarray(self.cfg.prompt_ids(language), jnp.int32)
        enc = whisper.encode(self.base_params, mel, self.cfg, lora=self.lora,
                             lora_scale=self.lora_cfg.scale)
        if num_beams > 1:
            from sar_tpu.decode.beam import beam_decode
            return beam_decode(self.base_params, enc, self.cfg, prompt,
                               num_beams=num_beams,
                               max_new_tokens=max_new_tokens, lora=self.lora,
                               lora_scale=self.lora_cfg.scale)
        return greedy_decode(self.base_params, enc, self.cfg, prompt,
                             max_new_tokens=max_new_tokens, lora=self.lora,
                             lora_scale=self.lora_cfg.scale)

    def transcribe(self, mel: jnp.ndarray, **kw) -> list[str]:
        tokens = self.generate(mel, **kw)
        prompt_len = len(self.cfg.prompt_ids(kw.get("language") or self.language))
        ids = transcribe_tokens(tokens, self.cfg, prompt_len=prompt_len)
        return [self.tokenizer.decode(r) for r in ids]

    # -- persistence ---------------------------------------------------------
    def save_adapter(self, path: str | Path) -> None:
        lora_lib.save_adapter(path, self.lora, self.lora_cfg,
                              metadata={"language": self.language,
                                        "model": self.cfg.name})

    def load_adapter(self, path: str | Path) -> None:
        self.lora, self.lora_cfg, meta = lora_lib.load_adapter(path)
        self.language = meta.get("language", self.language)

    def merge_and_unload(self) -> dict:
        """Fold the adapter into base weights; returns the merged pytree
        (parity with whisper_lora.py:234-240)."""
        return lora_lib.merge_lora(self.base_params, self.lora, self.lora_cfg)


def create_whisper_lora(model_name: str = "whisper-small",
                        language: str = "hindi", lora_rank: int = 16,
                        lora_alpha: int = 32, lora_dropout: float = 0.1,
                        target_modules=("q_proj", "v_proj"),
                        dtype=jnp.bfloat16, seed: int = 42) -> WhisperLoRA:
    """Factory (parity with whisper_lora.py:253-280)."""
    cfg, params = load_base_model(model_name, dtype=dtype)
    lcfg = lora_lib.LoraConfig(r=lora_rank, alpha=lora_alpha,
                               dropout=lora_dropout,
                               target_modules=tuple(target_modules))
    bank = lora_lib.init_lora(jax.random.PRNGKey(seed), cfg, lcfg)
    tok = get_tokenizer(model_name, language=language)
    return WhisperLoRA(cfg, params, bank, lcfg, tokenizer=tok, language=language)


def load_whisper_lora_from_checkpoint(checkpoint: str | Path,
                                      model_name: str = "whisper-small",
                                      language: str | None = None,
                                      dtype=jnp.bfloat16) -> WhisperLoRA:
    """Load base + adapter from a training checkpoint dir (parity with
    whisper_lora.py:283-325, minus its skipped-__init__ quirk)."""
    ckpt = Path(checkpoint)
    adapter_dir = ckpt / "adapter" if (ckpt / "adapter").exists() else ckpt
    bank, lcfg, meta = lora_lib.load_adapter(adapter_dir)
    language = language or meta.get("language", "hindi")
    cfg, params = load_base_model(model_name, dtype=dtype)
    tok = get_tokenizer(model_name, language=language)
    return WhisperLoRA(cfg, params, bank, lcfg, tokenizer=tok, language=language)
