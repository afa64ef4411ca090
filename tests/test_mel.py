"""Log-mel frontend parity vs the numerics the reference's data path produces
(HF WhisperFeatureExtractor, used at /root/reference/src/data/dataset.py:124-134)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.ops import mel as mel_ops

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def hf_fe():
    from transformers import WhisperFeatureExtractor
    return WhisperFeatureExtractor()  # offline: defaults, no hub access


def _rand_audio(rng, seconds=3.0):
    n = int(16000 * seconds)
    # Mix of tones + noise so the spectrogram has real structure.
    t = np.arange(n) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1337 * t)
         + 0.1 * rng.standard_normal(n))
    return x.astype(np.float32)


def test_mel_filter_bank_matches_hf(hf_fe):
    ours = mel_ops.mel_filter_bank(80)
    theirs = np.asarray(hf_fe.mel_filters)
    assert ours.shape == theirs.shape == (201, 80)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("seconds", [1.0, 7.3, 30.0])
def test_log_mel_matches_hf(hf_fe, rng, seconds):
    audio = _rand_audio(rng, seconds)
    theirs = hf_fe(audio, sampling_rate=16000, return_tensors="np")["input_features"][0]
    padded = mel_ops.pad_or_trim(jnp.asarray(audio))
    ours = np.asarray(mel_ops.log_mel_spectrogram(padded[None], num_mels=80)[0])
    assert ours.shape == theirs.shape == (80, 3000)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_log_mel_batched_consistent(rng):
    a = mel_ops.pad_or_trim(jnp.asarray(_rand_audio(rng, 2.0)))
    b = mel_ops.pad_or_trim(jnp.asarray(_rand_audio(rng, 5.0)))
    batch = mel_ops.log_mel_spectrogram(jnp.stack([a, b]))
    single_a = mel_ops.log_mel_spectrogram(a[None])[0]
    single_b = mel_ops.log_mel_spectrogram(b[None])[0]
    np.testing.assert_allclose(np.asarray(batch[0]), np.asarray(single_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch[1]), np.asarray(single_b), atol=1e-5)


def test_pad_or_trim():
    x = jnp.ones((2, 100))
    assert mel_ops.pad_or_trim(x, 200).shape == (2, 200)
    assert mel_ops.pad_or_trim(x, 50).shape == (2, 50)
    padded = mel_ops.pad_or_trim(x, 200)
    assert float(padded[:, 100:].sum()) == 0.0
