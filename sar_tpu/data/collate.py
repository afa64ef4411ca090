"""Batch collation for seq2seq ASR.

Capability parity with /root/reference/src/data/collate.py:
- mel features are fixed-shape (Whisper's 30 s window), stacked directly
- labels padded then masked to -100 for loss (collate.py:69-72)
- a leading BOS/SOT is stripped when every row starts with it — the model
  re-prepends it via shift_tokens_right (collate.py:74-76)
- `with_language` variant adds a language-id tensor (collate.py:84-104)

TPU-first difference: label padding is to a STATIC length (`max_label_length`,
default 448 = the Whisper cap at /root/reference/src/data/dataset.py:28) or
to a bucketed multiple, so jitted train steps never retrace on batch shape.
"""

from __future__ import annotations

import dataclasses

import numpy as np

LABEL_PAD = -100


def batch_features(items: list[dict], num_mels: int = 80,
                   num_frames: int | None = None) -> np.ndarray:
    """Stack precomputed "input_features", or — for raw-audio items —
    pad/trim to the 30 s window and run the batched ON-DEVICE mel frontend
    (replaces the reference's per-item CPU feature_extractor,
    dataset.py:124-134)."""
    if "input_features" in items[0]:
        return np.stack([np.asarray(it["input_features"], np.float32)
                         for it in items])
    import jax.numpy as jnp
    from sar_tpu.ops import mel as mel_ops
    audio = mel_ops.stack_pad_audio([it["audio"] for it in items])
    feats = np.asarray(mel_ops.log_mel_spectrogram_jit(
        jnp.asarray(audio), num_mels=num_mels))
    if num_frames is not None:
        feats = feats[:, :, :num_frames]
    return feats


@dataclasses.dataclass
class SpeechCollator:
    """Collates items {"input_features": [M, T], "labels": list[int],
    "text": str, optional "language_id": int} into numpy batches."""

    decoder_start_token_id: int
    pad_to_length: int = 448
    pad_to_multiple: int | None = None   # bucket instead of fixed length
    with_language: bool = False
    num_mels: int = 80                   # used only for the raw-audio path
    num_frames: int | None = None        # crop mel frames (model input size)

    def __call__(self, items: list[dict]) -> dict:
        feats = batch_features(items, self.num_mels, self.num_frames)
        labels = [list(it["labels"]) for it in items]

        # Strip a uniform leading SOT (model re-prepends it).
        if labels and all(l and l[0] == self.decoder_start_token_id for l in labels):
            labels = [l[1:] for l in labels]

        longest = max((len(l) for l in labels), default=1)
        if self.pad_to_multiple:
            m = self.pad_to_multiple
            target = ((longest + m - 1) // m) * m
        else:
            target = self.pad_to_length
        target = max(target, 1)

        out_labels = np.full((len(items), target), LABEL_PAD, np.int32)
        for i, l in enumerate(labels):
            l = l[:target]
            out_labels[i, :len(l)] = l

        batch = {"input_features": feats, "labels": out_labels,
                 "texts": [it.get("text", "") for it in items]}
        if self.with_language:
            batch["language_ids"] = np.asarray(
                [it["language_id"] for it in items], np.int32)
        return batch


def create_collator(decoder_start_token_id: int, with_language: bool = False,
                    **kw) -> SpeechCollator:
    """Factory, parity with /root/reference/src/data/collate.py:107-130."""
    return SpeechCollator(decoder_start_token_id=decoder_start_token_id,
                          with_language=with_language, **kw)


@dataclasses.dataclass
class LIDCollator:
    """Mel features + language labels for LID training (parity with
    /root/reference/scripts/train_router.py:151-169). Handles both
    precomputed-feature items and raw-audio items (ASRDataset output)."""

    num_mels: int = 80
    num_frames: int | None = None

    def __call__(self, items: list[dict]) -> dict:
        return {
            "input_features": batch_features(items, self.num_mels,
                                             self.num_frames),
            "language_ids": np.asarray(
                [it["language_id"] for it in items], np.int32),
        }
