"""Public model API (parity surface of /root/reference/src/models/__init__.py
plus the router exports the reference forgot — SURVEY.md §2.3 notes
AdapterRouter was never exported there)."""

from sar_tpu.models.base import (  # noqa: F401
    get_model_info,
    get_model_name,
    get_processor,
    load_base_model,
)
from sar_tpu.models.config import (  # noqa: F401
    LANGUAGE_CODES,
    MODEL_CONFIGS,
    TARGET_LANGUAGES,
    WhisperConfig,
    get_config,
)
from sar_tpu.models.lora import LoraConfig  # noqa: F401


def __getattr__(name):
    # Lazy heavy imports to keep `import sar_tpu.models` light.
    if name in ("WhisperLoRA", "create_whisper_lora",
                "load_whisper_lora_from_checkpoint"):
        from sar_tpu.models import whisper_lora
        return getattr(whisper_lora, name)
    if name in ("AdapterRouter", "build_router_from_checkpoints"):
        from sar_tpu.models import router
        return getattr(router, name)
    if name in ("LanguageClassifier",):
        from sar_tpu.models import classifier
        return classifier
    raise AttributeError(name)
