"""High-level WhisperLoRA handle API (parity surface of
/root/reference/src/models/whisper_lora.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.models import (create_whisper_lora, get_model_info,
                            get_model_name, get_processor,
                            load_whisper_lora_from_checkpoint)


@pytest.fixture(scope="module")
def handle():
    return create_whisper_lora("whisper-test", language="english",
                               lora_rank=4, lora_alpha=8, lora_dropout=0.0,
                               dtype=jnp.float32, seed=0)


def _mel(rng, handle, B=2):
    cfg = handle.cfg
    return jnp.asarray(rng.standard_normal(
        (B, cfg.num_mel_bins, cfg.max_source_positions * 2)), jnp.float32)


def test_forward_and_generate(handle, rng):
    mel = _mel(rng, handle)
    labels = jnp.asarray(rng.integers(10, 200, (2, 6)), jnp.int32)
    out = handle.forward(mel, labels)
    assert out["logits"].shape == (2, 6, handle.cfg.vocab_size)
    assert np.isfinite(float(out["loss"]))
    toks = handle.generate(mel, max_new_tokens=6)
    assert toks.shape[0] == 2
    beam = handle.generate(mel, max_new_tokens=6, num_beams=2)
    assert beam.shape == toks.shape
    texts = handle.transcribe(mel, max_new_tokens=6)
    assert len(texts) == 2


def test_adapter_roundtrip_and_checkpoint_load(handle, tmp_path, rng):
    handle.save_adapter(tmp_path / "ad")
    h2 = load_whisper_lora_from_checkpoint(tmp_path / "ad", "whisper-test",
                                           dtype=jnp.float32)
    assert h2.language == "english"
    mel = _mel(rng, handle, B=1)
    np.testing.assert_array_equal(
        np.asarray(handle.generate(mel, max_new_tokens=5)),
        np.asarray(h2.generate(mel, max_new_tokens=5)))


def test_merge_and_unload(handle, rng):
    merged = handle.merge_and_unload()
    from sar_tpu.models import whisper
    mel = _mel(rng, handle, B=1)
    labels = jnp.asarray(rng.integers(10, 200, (1, 5)), jnp.int32)
    direct = handle.forward(mel, labels)["logits"]
    dec_in = whisper.shift_tokens_right(labels, handle.cfg.sot_token_id,
                                        handle.cfg.pad_token_id)
    folded = whisper.forward(merged, mel, dec_in, handle.cfg)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(folded),
                               atol=2e-4)


def test_base_helpers():
    assert get_model_name("whisper-large") == "openai/whisper-large-v3"
    info = get_model_info("whisper-medium")
    assert info["d_model"] == 1024 and info["encoder_layers"] == 24
    features, tok = get_processor("whisper-test", language="english")
    audio = jnp.zeros((1, 480_000), jnp.float32)
    assert features(audio).shape == (1, 80, 3000)
    assert tok.decode(tok.encode("hi", language="english")) == "hi"


def test_transcribe_audio_helpers(handle, rng):
    """transcribe_audio / batch_transcribe parity surface
    (/root/reference/src/evaluation/__init__.py:172-292)."""
    from sar_tpu.evaluation.evaluator import batch_transcribe, transcribe_audio
    from sar_tpu.ops.mel import N_SAMPLES
    # whisper-test consumes 64 mel frames; the helpers pad to the 30 s window
    # then the model crops positions — just exercise shapes/flow.
    audios = [rng.standard_normal(16000).astype("float32") for _ in range(3)]
    texts = batch_transcribe(audios, handle.cfg, handle.base_params,
                             handle.tokenizer, language="english",
                             batch_size=2, max_new_tokens=4)
    assert len(texts) == 3
    one = transcribe_audio(audios[0], handle.cfg, handle.base_params,
                           handle.tokenizer, language="english",
                           max_new_tokens=4)
    assert isinstance(one, str)
