"""Public model API (parity surface of /root/reference/src/models/__init__.py
plus the router exports the reference forgot — SURVEY.md §2.3 notes
AdapterRouter was never exported there)."""

from sar_tpu.models.config import (  # noqa: F401
    LANGUAGE_CODES,
    MODEL_CONFIGS,
    TARGET_LANGUAGES,
    WhisperConfig,
    get_config,
    get_model_info,
)
from sar_tpu.models.lora import LoraConfig  # noqa: F401

_LAZY = {
    # base.py pulls in the data package (tokenizer) — import lazily to avoid
    # a models <-> data import cycle.
    "get_model_name": "base",
    "get_processor": "base",
    "load_base_model": "base",
    "WhisperLoRA": "whisper_lora",
    "create_whisper_lora": "whisper_lora",
    "load_whisper_lora_from_checkpoint": "whisper_lora",
    "AdapterRouter": "router",
    "build_router_from_checkpoints": "router",
    "LanguageClassifier": "classifier",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f"sar_tpu.models.{_LAZY[name]}")
        return getattr(mod, name)
    raise AttributeError(name)
