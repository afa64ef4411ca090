"""Synthetic in-memory ASR dataset — the hermetic test substrate.

The reference's tests hit real HF Hub datasets and real weights
(/root/reference/test_cv_load.py, test_inference_run.py); this framework's
suite instead trains/evaluates on synthetic utterances whose mel features are
a deterministic function of the text, so a tiny model can actually learn the
mapping — no network, no audio files.
"""

from __future__ import annotations

import numpy as np

from sar_tpu.data.tokenizer import CharTokenizer
from sar_tpu.models.config import WhisperConfig

_WORDS = ["aba", "bob", "cud", "dig", "eel", "fog", "gum", "hat"]


class SyntheticASRDataset:
    """List-like dataset of {"input_features", "labels", "text", "language_id"}.

    Each word renders a distinct band pattern over 8 mel frames; texts are
    `num_words` draws from an 8-word vocabulary. Different `language_id`s use
    disjoint word offsets so a LID classifier has real signal too.
    """

    def __init__(self, cfg: WhisperConfig, size: int = 64, num_words: int = 3,
                 language: str = "english", language_id: int = 0, seed: int = 0):
        self.cfg = cfg
        self.tokenizer = CharTokenizer(cfg)
        self.language = language
        self.language_id = language_id
        # Acoustic/lexical identity keys off the language NAME so renders are
        # consistent across phases regardless of positional class ids.
        self._accent = sum(language.encode()) % 97
        rng = np.random.default_rng(seed + 1000 * self._accent)
        self._items = []
        n_frames = cfg.max_source_positions * 2
        for _ in range(size):
            words = [
                _WORDS[(w + 2 * self._accent) % len(_WORDS)]
                for w in rng.integers(0, len(_WORDS), num_words)
            ]
            text = " ".join(words)
            mel = self._render(words, n_frames, rng)
            labels = self.tokenizer.encode(text, language=language)
            self._items.append({
                "input_features": mel,
                "labels": labels,
                "text": text,
                "language_id": language_id,
            })

    def _render(self, words: list[str], n_frames: int, rng) -> np.ndarray:
        mel = rng.standard_normal((self.cfg.num_mel_bins, n_frames)).astype(np.float32) * 0.05
        # Persistent per-language "accent band" so LID signal survives pooling.
        accent = (3 * self._accent) % self.cfg.num_mel_bins
        mel[accent:accent + 4, :] += 3.0
        pos = 2
        for w in words:
            # Band depends on word AND language (a crude accent), so both ASR
            # and LID have learnable signal.
            band = (sum(w.encode()) * 7 + 13 * self._accent) \
                % (self.cfg.num_mel_bins - 8)
            mel[band:band + 8, pos:pos + 8] += 1.0
            pos = min(pos + 10, n_frames - 10)
        return mel

    def __len__(self):
        return len(self._items)

    def __getitem__(self, i):
        return self._items[i]
