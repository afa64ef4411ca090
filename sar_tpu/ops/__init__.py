from sar_tpu.ops.mel import (  # noqa: F401
    log_mel_spectrogram,
    log_mel_spectrogram_jit,
    mel_filter_bank,
    pad_or_trim,
    N_SAMPLES,
    N_FRAMES,
    SAMPLE_RATE,
)
