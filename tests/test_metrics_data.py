"""Metrics (WER/CER/error analysis) and data-layer (collate/loader) tests,
mirroring the semantics of /root/reference/src/training/metrics.py and
src/data/collate.py."""

import numpy as np
import pytest

from sar_tpu.data.collate import LABEL_PAD, create_collator
from sar_tpu.data.loader import DataLoader
from sar_tpu.data.synthetic import SyntheticASRDataset
from sar_tpu.models.config import get_config
from sar_tpu.training.metrics import (analyze_errors, compute_cer,
                                      compute_metrics,
                                      compute_metrics_per_sample, compute_wer,
                                      edit_distance)

pytestmark = pytest.mark.smoke


def test_wer_exact_match_zero():
    assert compute_wer(["hello world"], ["hello world"]) == 0.0
    assert compute_cer(["hello"], ["hello"]) == 0.0


def test_wer_perturbed_positive():
    assert compute_wer(["hello word"], ["hello world"]) > 0
    assert compute_cer(["hellp"], ["hello"]) > 0


def test_wer_can_exceed_one():
    # Corpus-level aggregated edit distance, parity with metrics.py docs.
    assert compute_wer(["a b c d e f"], ["a"]) > 1.0


def test_empty_guard():
    # Empty strings become "<empty>" (metrics.py:50-52) — no crash, WER 1.0.
    assert compute_wer([""], ["hello"]) == 1.0
    assert compute_wer(["hello"], [""]) > 0


def test_corpus_weighting():
    # Corpus WER = total errors / total ref words, not mean of per-sample.
    wer = compute_wer(["a x", "b"], ["a y", "b"])
    np.testing.assert_allclose(wer, 1 / 3)


def test_per_sample_and_analysis():
    per = compute_metrics_per_sample(["a b", "c"], ["a b", "d"])
    assert per[0]["wer"] == 0.0 and per[1]["wer"] == 1.0
    ana = analyze_errors(["a x"], ["a y"])
    assert ("x", 1) in ana["top_insertions"]
    assert ("y", 1) in ana["top_deletions"]


def test_edit_distance_unicode():
    assert edit_distance(list("नमस्ते"), list("नमस्ते")) == 0
    assert edit_distance(list("नमस्ते"), list("नमस्ता")) == 1


def test_collator_masks_and_strips_bos():
    cfg = get_config("whisper-test")
    coll = create_collator(cfg.sot_token_id, pad_to_length=8)
    items = [
        {"input_features": np.zeros((80, 64), np.float32),
         "labels": [cfg.sot_token_id, 10, 11, cfg.eos_token_id], "text": "ab"},
        {"input_features": np.zeros((80, 64), np.float32),
         "labels": [cfg.sot_token_id, 12, cfg.eos_token_id], "text": "c"},
    ]
    b = coll(items)
    assert b["labels"].shape == (2, 8)
    # BOS stripped (collate.py:74-76 semantics).
    assert b["labels"][0, 0] == 10
    # Padding masked to -100 (collate.py:69-72).
    assert (b["labels"][1, 2:] == LABEL_PAD).all()


def test_collator_language_ids():
    cfg = get_config("whisper-test")
    coll = create_collator(cfg.sot_token_id, with_language=True, pad_to_length=4)
    items = [{"input_features": np.zeros((80, 64), np.float32),
              "labels": [1], "text": "", "language_id": 3}]
    assert coll(items)["language_ids"].tolist() == [3]


def test_collator_bucketing():
    cfg = get_config("whisper-test")
    coll = create_collator(cfg.sot_token_id, pad_to_multiple=16)
    items = [{"input_features": np.zeros((80, 64), np.float32),
              "labels": list(range(20)), "text": ""}]
    assert coll(items)["labels"].shape[1] == 32


def test_loader_epochs_and_shuffle():
    cfg = get_config("whisper-test")
    ds = SyntheticASRDataset(cfg, size=9, seed=0)
    coll = create_collator(cfg.sot_token_id, pad_to_length=16)
    loader = DataLoader(ds, batch_size=3, collator=coll, seed=5)
    assert len(loader) == 3
    batches = list(loader.one_epoch(0))
    assert len(batches) == 3
    it = loader.iterate()
    stream = [next(it) for _ in range(7)]   # crosses an epoch boundary
    assert all(b["input_features"].shape == (3, 80, 64) for b in stream)
    # Different epochs shuffle differently.
    e0 = [t for b in loader.one_epoch(0) for t in b["texts"]]
    e1 = [t for b in loader.one_epoch(1) for t in b["texts"]]
    assert sorted(e0) == sorted(e1)


def test_loader_num_workers_order_preserved():
    cfg = get_config("whisper-test")
    ds = SyntheticASRDataset(cfg, size=12, seed=0)
    coll = create_collator(cfg.sot_token_id, pad_to_length=16)
    serial = DataLoader(ds, 3, coll, shuffle=False, num_workers=0)
    parallel = DataLoader(ds, 3, coll, shuffle=False, num_workers=4)
    a = [b["texts"] for b in serial.one_epoch()]
    b = [b["texts"] for b in parallel.one_epoch()]
    assert a == b
