"""WER/CER metrics — self-contained edit distance (no jiwer/evaluate deps).

Capability parity with /root/reference/src/training/metrics.py:
corpus-level WER/CER (aggregated edit distance over the corpus, can exceed
1.0), the empty-string "<empty>" guard (metrics.py:50-52,75-77), per-sample
metrics (metrics.py:100-123), and insertion/deletion error analysis
(metrics.py:126-168).
"""

from __future__ import annotations

from collections import Counter

import numpy as np


def edit_distance(ref: list, hyp: list) -> int:
    """Levenshtein distance between token sequences (vectorized row DP)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    hyp_arr = np.asarray(hyp, dtype=object)
    idx = np.arange(m + 1)
    prev = idx.copy()
    for i in range(1, n + 1):
        sub = prev[:-1] + (hyp_arr != ref[i - 1])
        cand = np.empty(m + 1, dtype=np.int64)
        cand[0] = i
        cand[1:] = np.minimum(prev[1:] + 1, sub)
        # cur[j] = min(cand[j], cur[j-1] + 1)  ==  j + min-accumulate(cand - j):
        prev = idx + np.minimum.accumulate(cand - idx)
    return int(prev[m])


def _guard(texts: list[str]) -> list[str]:
    """Empty-string placeholder, parity with metrics.py:50-52."""
    return [t if t.strip() else "<empty>" for t in texts]


def _corpus_distance(ref_seqs: list[list], hyp_seqs: list[list]) -> int:
    """Total edit distance over a corpus; native C++ batch path when
    available (sar_tpu/native), numpy DP otherwise. Tokens are interned to
    int32 ids so both paths compare ids, not objects."""
    try:
        from sar_tpu.utils.native import batch_edit_distance
        intern: dict = {}

        def ids(seq):
            out = np.empty(len(seq), np.int32)
            for i, t in enumerate(seq):
                out[i] = intern.setdefault(t, len(intern))
            return out

        a = [ids(s) for s in ref_seqs]
        b = [ids(s) for s in hyp_seqs]
        dists = batch_edit_distance(a, b)
        if dists is not None:
            return int(dists.sum())
    except Exception:
        pass
    return sum(edit_distance(r, h) for r, h in zip(ref_seqs, hyp_seqs))


def compute_wer(predictions: list[str], references: list[str]) -> float:
    """Corpus WER: total word edit distance / total reference words."""
    predictions, references = _guard(predictions), _guard(references)
    dist = _corpus_distance([r.split() for r in references],
                            [p.split() for p in predictions])
    total = sum(len(r.split()) for r in references)
    return dist / max(total, 1)


def compute_cer(predictions: list[str], references: list[str]) -> float:
    """Corpus CER: total char edit distance / total reference chars."""
    predictions, references = _guard(predictions), _guard(references)
    dist = _corpus_distance([list(r) for r in references],
                            [list(p) for p in predictions])
    total = sum(len(r) for r in references)
    return dist / max(total, 1)


def compute_metrics(predictions: list[str], references: list[str]) -> dict:
    """{wer, cer}; parity with metrics.py:81-97."""
    return {"wer": compute_wer(predictions, references),
            "cer": compute_cer(predictions, references)}


def compute_metrics_per_sample(predictions: list[str],
                               references: list[str]) -> list[dict]:
    """Per-sample WER/CER + word counts; parity with metrics.py:100-123."""
    out = []
    for p, r in zip(predictions, references):
        out.append({
            "wer": compute_wer([p], [r]),
            "cer": compute_cer([p], [r]),
            "ref_words": len(r.split()),
            "pred_words": len(p.split()),
        })
    return out


def analyze_errors(predictions: list[str], references: list[str],
                   top_k: int = 10) -> dict:
    """Crude insertion/deletion word counters; parity with metrics.py:126-168."""
    insertions: Counter = Counter()
    deletions: Counter = Counter()
    for p, r in zip(predictions, references):
        pw, rw = set(p.split()), set(r.split())
        for w in pw - rw:
            insertions[w] += 1
        for w in rw - pw:
            deletions[w] += 1
    return {
        "top_insertions": insertions.most_common(top_k),
        "top_deletions": deletions.most_common(top_k),
        "total_insertions": sum(insertions.values()),
        "total_deletions": sum(deletions.values()),
    }
