"""Long-form (>30 s) transcription — beyond the reference, which drops
long clips entirely."""

import numpy as np
import pytest

from sar_tpu.evaluation.longform import chunk_audio, transcribe_long


def test_chunk_short_audio_passthrough():
    a = np.zeros(16000, np.float32)
    assert len(chunk_audio(a)) == 1


def test_chunk_long_audio():
    a = np.arange(16000 * 75, dtype=np.float32)   # 75 s
    chunks = chunk_audio(a, chunk_seconds=30.0)
    assert len(chunks) == 3
    assert len(chunks[0]) == len(chunks[1]) == 16000 * 30
    assert len(chunks[2]) == 16000 * 15
    # Order preserved, no samples lost.
    np.testing.assert_array_equal(np.concatenate(chunks), a)


def test_chunk_overlap():
    a = np.zeros(16000 * 60, np.float32)
    chunks = chunk_audio(a, chunk_seconds=30.0, overlap_seconds=5.0)
    assert len(chunks) == 3                       # hop 25 s over 60 s
    with pytest.raises(ValueError):
        chunk_audio(a, chunk_seconds=10.0, overlap_seconds=10.0)


def test_transcribe_long_flow(rng):
    import jax
    import jax.numpy as jnp
    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.models import whisper
    from sar_tpu.models.config import get_config

    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    tok = CharTokenizer(cfg)
    audio = rng.standard_normal(16000 * 70).astype(np.float32)  # 70 s
    text = transcribe_long(audio, cfg, params, tok, language="english",
                           max_new_tokens=4, batch_size=2)
    assert isinstance(text, str)


def test_transcribe_long_segment_timestamps(rng):
    """timestamps=True: each window decodes under the timestamp grammar and
    segments land on the global clock (chunk offsets applied)."""
    import jax

    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.models import whisper
    from sar_tpu.models.config import get_config

    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    audio = (rng.standard_normal(int(1.8 * 16000)) * 0.1).astype(np.float32)
    text, segments = transcribe_long(audio, cfg, params, CharTokenizer(cfg),
                                     language="english", max_new_tokens=8,
                                     chunk_seconds=0.6, batch_size=2,
                                     timestamps=True)
    assert isinstance(text, str)
    starts = [s for s, _, _ in segments if s is not None]
    assert starts == sorted(starts)
    for t0, t1, seg_text in segments:
        assert seg_text.strip()
        if t0 is not None and t1 is not None:
            assert 0.0 <= t0 <= t1 <= 2.0
    with pytest.raises(ValueError):
        transcribe_long(audio, cfg, params, CharTokenizer(cfg),
                        chunk_seconds=0.6, timestamps=True,
                        word_timestamps=True)
