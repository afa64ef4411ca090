"""openai's hallucination-silence heuristics: unit tests for the scoring
functions (hand-computed expectations — the openai-whisper package is not
installed to diff against) plus scripted conditioned-loop tests of the
seek adjustments in evaluation/longform.py."""

import numpy as np

from sar_tpu.evaluation.hallucination import (get_end, is_segment_anomaly,
                                              next_words_segment,
                                              word_anomaly_score)


def _w(word="hello", start=0.0, end=0.5, prob=0.9):
    return {"word": word, "start": start, "end": end, "probability": prob}


def test_word_anomaly_score():
    assert word_anomaly_score(_w(prob=0.9, start=0.0, end=0.5)) == 0.0
    # improbable word -> +1
    assert word_anomaly_score(_w(prob=0.1)) == 1.0
    # too short: (0.133 - d) * 15
    s = word_anomaly_score(_w(start=0.0, end=0.033))
    assert abs(s - (0.133 - 0.033) * 15) < 1e-9
    # too long: excess seconds
    assert abs(word_anomaly_score(_w(start=0.0, end=3.0)) - 1.0) < 1e-9
    # combined
    s = word_anomaly_score(_w(prob=0.05, start=0.0, end=2.5))
    assert abs(s - 1.5) < 1e-9


def test_is_segment_anomaly():
    assert not is_segment_anomaly(None)
    assert not is_segment_anomaly({"start": 0, "end": 1, "words": []})
    good = {"words": [_w(), _w(start=0.5, end=0.9)]}
    assert not is_segment_anomaly(good)
    # one improbable word out of one -> score 1, 1 + 0.01 >= 1 word
    assert is_segment_anomaly({"words": [_w(prob=0.01)]})
    # score >= 3 triggers regardless of word count
    many = {"words": [_w(prob=0.01), _w(prob=0.01), _w(prob=0.01),
                      _w(), _w(), _w(), _w(), _w()]}
    assert is_segment_anomaly(many)
    # punctuation-only words never score
    assert not is_segment_anomaly({"words": [_w(word=","), _w(word=".")]})
    # only the first 8 words are scored: anomalies past them don't count
    tail = {"words": [_w() for _ in range(8)] + [_w(prob=0.01)] * 4}
    assert not is_segment_anomaly(tail)


def test_next_words_segment_and_get_end():
    segs = [{"start": 0, "end": 1, "words": []},
            {"start": 1, "end": 2, "words": [_w(start=1.1, end=1.9)]},
            {"start": 2, "end": 3, "words": []}]
    assert next_words_segment(segs) is segs[1]
    assert get_end(segs) == 1.9
    assert get_end([{"start": 0, "end": 4, "words": []}]) == 4
    assert get_end([]) is None
    assert next_words_segment([]) is None


# ---------------------------------------------------------------------------
# Conditioned-loop seek behavior (scripted transcriber + scripted aligner).

class _FakeTranscriber:
    script: list = []
    calls: list = []

    def __init__(self, cfg, params, tokenizer, **kw):
        self.cfg = cfg

    def __call__(self, mel, n_valid=None, prompt=None, prompt_len=None):
        _FakeTranscriber.calls.append(
            (None if prompt is None else np.asarray(prompt).copy(),
             prompt_len))
        i = min(len(_FakeTranscriber.calls) - 1,
                len(_FakeTranscriber.script) - 1)
        text, ids = _FakeTranscriber.script[i]
        row = {"temperature": 0.0, "avg_logprob": -0.1,
               "no_speech_prob": 0.0, "compression_ratio": 1.0,
               "ids": list(ids)}
        return [text], [row]


class _FakeAligner:
    """Scripted _window_segment_words: per call, per split, LOCAL words."""

    script: list = []
    calls: int = 0

    def __call__(self, params, feats, splits, cfg, tokenizer, *,
                 align_prompt, lora, lora_scale, chunk_len):
        i = min(_FakeAligner.calls, len(_FakeAligner.script) - 1)
        _FakeAligner.calls += 1
        out = _FakeAligner.script[i]
        assert len(out) == len(splits), (
            f"script call {i}: {len(out)} word lists for "
            f"{len(splits)} splits")
        return out


class _LetterTok:
    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + int(i) % 26) for i in ids)


def _setup(monkeypatch, transcriber_script, aligner_script):
    import sar_tpu.evaluation.fallback as fb
    import sar_tpu.evaluation.longform as lf
    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    _FakeTranscriber.script = transcriber_script
    _FakeTranscriber.calls = []
    _FakeAligner.script = aligner_script
    _FakeAligner.calls = 0
    monkeypatch.setattr(fb, "FallbackTranscriber", _FakeTranscriber)
    monkeypatch.setattr(lf, "_window_segment_words", _FakeAligner())
    return cfg, _LetterTok()


def _ts(cfg, s):
    return cfg.no_timestamps_token_id + 1 + round(s / 0.02)


def test_word_end_seek_refinement(monkeypatch):
    """Without a hallucination threshold, combined mode seeks to the LAST
    ALIGNED WORD's end — finer than the last closed segment's timestamp."""
    from sar_tpu.evaluation.longform import transcribe_long
    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    ts = lambda s: _ts(cfg, s)  # noqa: E731
    a, b, e = 60, 61, 64
    # w0: closed [0,2] over [a] + open tail [b] (dropped) -> not a
    # single-timestamp ending, word end 1.2 < 2.0 -> seek 1.2 s.
    cfg, tok = _setup(
        monkeypatch,
        [("w0", [ts(0.0), a, ts(2.0), ts(2.0), b]),
         ("w1", [ts(0.0), e, ts(1.0)])],
        [[[_w("aa", 0.3, 1.2, 0.9)]],
         [[_w("ee", 0.1, 0.8, 0.9)]],
         [[]]])
    audio = np.zeros(3 * 16000, np.float32)
    text, segments, words = transcribe_long(
        audio, cfg, None, tok, language="english", chunk_seconds=2.0,
        max_new_tokens=8, condition_on_previous_text=True,
        timestamps=True, word_timestamps=True)
    # Window 1 starts at the word end (1.2 s), not the closed end (2.0 s):
    # its closed [0,1] segment lands globally at [1.2, 2.2].
    assert segments[1][:2] == (1.2, 2.2)
    assert words[0] == _w("aa", 0.3, 1.2, 0.9)          # global == local (off 0)
    assert words[1]["start"] == 1.3 and words[1]["end"] == 2.0


def test_hallucination_gap_skip_drops_window(monkeypatch):
    """A leading anomalous segment after a silent gap > threshold: the
    window contributes NOTHING and the seek jumps over the gap."""
    from sar_tpu.evaluation.longform import transcribe_long
    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    ts = lambda s: _ts(cfg, s)  # noqa: E731
    a, e = 60, 64
    cfg, tok = _setup(
        monkeypatch,
        # w0: one closed segment [2.5, 3.5] whose only word is garbage.
        [("halluc", [ts(2.5), a, ts(3.5)]),
         ("good", [ts(0.0), e, ts(1.0)])],
        # improbable word -> segment anomaly; gap 2.5 > threshold 1.0
        [[[_w("xx", 2.6, 3.4, 0.01)]],
         [[_w("ee", 0.1, 0.9, 0.9)]],
         [[]]])
    audio = np.zeros(6 * 16000, np.float32)
    text, segments, words = transcribe_long(
        audio, cfg, None, tok, language="english", chunk_seconds=4.0,
        max_new_tokens=8, condition_on_previous_text=True,
        timestamps=True, word_timestamps=True,
        hallucination_silence_threshold=1.0)
    # The hallucinated window is fully dropped...
    assert tok.decode([a]).strip() not in text
    assert all(s[2] != tok.decode([a]).strip() for s in segments)
    # ...and window 1 began at the gap (2.5 s): its segment is global
    # [2.5, 3.5].
    assert segments[0][:2] == (2.5, 3.5)
    assert words and words[0]["start"] == 2.6
    # The dropped window also never entered the rolling context.
    prompt1, plen1 = _FakeTranscriber.calls[1]
    assert a not in list(prompt1[0, :plen1])


def test_hallucination_surrounded_truncation(monkeypatch):
    """An anomalous segment surrounded by silence: segments before it are
    kept, it and everything after are dropped, and the seek lands on its
    start for a re-decode."""
    from sar_tpu.evaluation.longform import transcribe_long
    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    ts = lambda s: _ts(cfg, s)  # noqa: E731
    a, b, e = 60, 61, 64
    cfg, tok = _setup(
        monkeypatch,
        # w0 (6 s window): good [0.2, 1.0], then garbage [3.0, 4.0]
        # preceded by 2 s of silence and followed by 2 s of silence.
        [("w0", [ts(0.2), a, ts(1.0), ts(3.0), b, ts(4.0)]),
         ("w1", [ts(0.0), e, ts(1.0)])],
        [[[_w("aa", 0.3, 0.9, 0.9)], [_w("xx", 3.1, 3.9, 0.01)]],
         [[_w("ee", 0.1, 0.9, 0.9)]],
         [[]]])
    audio = np.zeros(8 * 16000, np.float32)
    text, segments, words = transcribe_long(
        audio, cfg, None, tok, language="english", chunk_seconds=6.0,
        max_new_tokens=8, condition_on_previous_text=True,
        timestamps=True, word_timestamps=True,
        hallucination_silence_threshold=1.0)
    # The good head survived; the hallucination did not.
    assert segments[0][:2] == (0.2, 1.0)
    assert all(s[2] != tok.decode([b]).strip() for s in segments)
    assert all(w["word"] != "xx" for w in words)
    # The next window re-decodes from the hallucination's start (3.0 s).
    assert segments[1][:2] == (3.0, 4.0)
    # Context carried only the kept tokens.
    prompt1, plen1 = _FakeTranscriber.calls[1]
    ctx = list(prompt1[0, :plen1])
    assert a in ctx and b not in ctx
