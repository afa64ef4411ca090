from sar_tpu.evaluation.evaluator import (  # noqa: F401
    ASREvaluator,
    batch_transcribe,
    transcribe_audio,
)
from sar_tpu.evaluation.longform import chunk_audio, transcribe_long  # noqa: F401
from sar_tpu.evaluation.streaming import StreamingTranscriber  # noqa: F401
