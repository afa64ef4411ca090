"""Dataset layer: ASRDataset filters, create_dataset mixing/caps, and the
preprocessing ops — hermetic (fake HF-style datasets, synthetic audio)."""

import numpy as np
import pytest

from sar_tpu.data.datasets import ASRDataset, _ConcatDataset, create_dataset
from sar_tpu.data.preprocessing import (AudioPreprocessor, SpecAugment,
                                        load_audio, resample)
from sar_tpu.data.tokenizer import CharTokenizer
from sar_tpu.models.config import get_config


def _fake_hf(n, seconds, text="hello world", sr=16000):
    return [{"audio": {"array": np.random.default_rng(i).standard_normal(
        int(seconds * sr)).astype(np.float32), "sampling_rate": sr},
             "text": text} for i, _ in enumerate(range(n))]


@pytest.fixture(scope="module")
def tok():
    return CharTokenizer(get_config("whisper-test"))


def test_duration_filter(tok):
    ds = _fake_hf(3, 5.0) + _fake_hf(2, 0.5) + _fake_hf(2, 31.0)
    out = ASRDataset(ds, tok, min_duration=1.0, max_duration=30.0)
    assert len(out) == 3


def test_label_length_filter(tok):
    ds = _fake_hf(2, 5.0, text="ok") + _fake_hf(2, 5.0, text="x" * 500)
    out = ASRDataset(ds, tok, max_label_length=30)
    assert len(out) == 2


def test_asr_dataset_items(tok):
    out = ASRDataset(_fake_hf(2, 3.0), tok, language="english", language_id=3)
    item = out[0]
    assert item["language_id"] == 3
    assert item["text"] == "hello world"
    assert item["labels"][0] == get_config("whisper-test").sot_token_id
    assert item["audio"].dtype == np.float32


def test_create_dataset_synthetic_split_seeds():
    tr = create_dataset("english", ["synthetic"], split="train",
                        synthetic_size=8)
    te = create_dataset("english", ["synthetic"], split="test",
                        synthetic_size=8)
    assert len(tr) == len(te) == 8
    assert tr[0]["text"] != te[0]["text"] or \
        not np.allclose(tr[0]["input_features"], te[0]["input_features"])


def test_create_dataset_max_samples():
    ds = create_dataset("english", ["synthetic"], synthetic_size=32,
                        max_samples=10)
    assert len(ds) == 10


def test_concat_dataset():
    a, b = _fake_hf(3, 1.0), _fake_hf(5, 1.0, text="zz")
    c = _ConcatDataset([a, b])
    assert len(c) == 8
    assert c[2]["text"] == "hello world"
    assert c[3]["text"] == "zz"


def test_resample_preserves_tone():
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 2
    # The dominant frequency must stay at 440 Hz.
    spec = np.abs(np.fft.rfft(y[:sr_out]))
    assert abs(np.argmax(spec) - 440) <= 2


def test_preprocessor_pipeline():
    pp = AudioPreprocessor(normalize=True, trim_silence=True,
                           max_duration=2.0)
    sr = 16000
    sig = np.concatenate([np.zeros(sr), np.sin(np.linspace(0, 800, sr)) * 2.0,
                          np.zeros(sr)]).astype(np.float32)
    out = pp(sig, sr)
    assert np.abs(out).max() <= 1.0 + 1e-6
    assert len(out) < len(sig)          # silence trimmed
    assert len(out) <= 2.0 * sr         # max duration


def test_preprocessor_stereo_and_resample():
    pp = AudioPreprocessor()
    stereo = np.stack([np.ones(8000), -np.ones(8000)]).astype(np.float32)
    out = pp(stereo, 8000)
    assert out.ndim == 1
    assert len(out) == 16000            # 8k -> 16k


def test_spec_augment_masks():
    sa = SpecAugment(freq_mask_param=10, time_mask_param=20, seed=0)
    mel = np.random.default_rng(0).standard_normal((80, 300)).astype(np.float32)
    out = sa(mel)
    assert out.shape == mel.shape
    assert not np.allclose(out, mel)


def test_load_audio_wav(tmp_path):
    import wave
    sr = 16000
    sig = (np.sin(np.linspace(0, 100, sr)) * 0.5 * 32767).astype(np.int16)
    path = tmp_path / "t.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(sig.tobytes())
    audio = load_audio(path)
    assert audio.shape == (sr,)
    np.testing.assert_allclose(audio, sig / 32767.0, atol=1e-3)
