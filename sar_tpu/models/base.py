"""Model + tokenizer loading — parity with /root/reference/src/models/base.py.

load_base_model(): returns (config, param pytree) for a registry name —
random-init for `whisper-test` (hermetic), HF-checkpoint conversion for real
sizes (requires network or a local HF cache; the reference's bf16 auto-select
at base.py:103-111 maps to `dtype` here, and its clearing of
forced_decoder_ids/suppress_tokens at base.py:129-131 is structural: decoding
always builds its prompt explicitly and suppresses nothing by default).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from sar_tpu.data.tokenizer import get_tokenizer  # noqa: F401  (re-export)
from sar_tpu.models import convert, whisper
from sar_tpu.models.config import HF_MODEL_IDS, get_config

logger = logging.getLogger(__name__)


def get_model_name(short_name: str) -> str:
    """short name -> HF hub id (parity with base.py:134-139)."""
    return HF_MODEL_IDS.get(short_name, short_name)


def get_processor(model_name: str, language: str = "hindi",
                  task: str = "transcribe"):
    """(feature-extraction fn, tokenizer) pair. The reference returns an HF
    WhisperProcessor (base.py:44-74); here feature extraction is the
    on-device mel frontend, so the "processor" is (log_mel fn, tokenizer)."""
    from sar_tpu.ops.mel import log_mel_spectrogram_jit
    cfg = get_config(model_name)
    tok = get_tokenizer(model_name, language=language, task=task)

    def features(audio):
        return log_mel_spectrogram_jit(audio, num_mels=cfg.num_mel_bins)

    return features, tok


def load_base_model(model_name: str, dtype=jnp.bfloat16, seed: int = 0,
                    cache_dir: str | None = None):
    """(cfg, params). Real models convert HF weights; whisper-test is
    random-init."""
    cfg = get_config(model_name)
    if model_name == "whisper-test":
        params = whisper.init_params(jax.random.PRNGKey(seed), cfg)
    else:
        from transformers import WhisperForConditionalGeneration
        hf_id = HF_MODEL_IDS[model_name]
        logger.info("loading HF weights %s", hf_id)
        hf = WhisperForConditionalGeneration.from_pretrained(
            hf_id, cache_dir=cache_dir)
        params = jax.tree.map(jnp.asarray, convert.from_hf_model(hf, cfg))
        del hf
    if dtype != jnp.float32:
        params = whisper.cast_params(params, dtype)
    return cfg, params
