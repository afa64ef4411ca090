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
    # Combined segments+words mode (openai's output shape): 3-tuple, words
    # on the global clock with probabilities.
    text2, segments2, words2 = transcribe_long(
        audio, cfg, params, CharTokenizer(cfg), language="english",
        max_new_tokens=8, chunk_seconds=0.6, batch_size=2,
        timestamps=True, word_timestamps=True)
    assert text2 == text
    assert [s[2] for s in segments2] == [s[2] for s in segments]
    for w in words2:
        assert 0.0 <= w["start"] <= w["end"] <= 2.0
        assert "probability" in w
    # hallucination_silence_threshold demands both timestamp modes.
    with pytest.raises(ValueError):
        transcribe_long(audio, cfg, params, CharTokenizer(cfg),
                        chunk_seconds=0.6, timestamps=True,
                        hallucination_silence_threshold=2.0)


def _world():
    import jax

    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.models import whisper
    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params, CharTokenizer(cfg)


def test_conditioned_longform_runs_and_builds_context(rng, monkeypatch):
    """Sequential conditioned loop: the second window's prompt carries
    <|startofprev|> + the first window's ids (captured via the transcriber
    call); initial_prompt conditions the first window."""
    from sar_tpu.evaluation import fallback as fb
    cfg, params, tok = _world()
    audio = (rng.standard_normal(int(1.2 * 16000)) * 0.1).astype(np.float32)

    seen = []
    orig = fb.FallbackTranscriber.__call__

    def spy(self, mel, n_valid=None, prompt=None, prompt_len=None):
        seen.append((None if prompt is None else np.asarray(prompt).copy(),
                     prompt_len))
        return orig(self, mel, n_valid=n_valid, prompt=prompt,
                    prompt_len=prompt_len)

    monkeypatch.setattr(fb.FallbackTranscriber, "__call__", spy)
    text = transcribe_long(audio, cfg, params, tok, language="english",
                           max_new_tokens=6, chunk_seconds=0.6,
                           condition_on_previous_text=True)
    assert isinstance(text, str)
    assert len(seen) >= 2
    P_std = len(cfg.prompt_ids("english"))
    _, first_plen = seen[0]
    second_prompt, second_plen = seen[1]
    assert first_plen == P_std                 # no context yet
    # window 2 carries context iff window 1 produced any ids
    if second_plen > P_std:
        assert second_prompt[0, 0] == cfg.prev_sot_token_id
        # the std prompt closes the prefix
        assert list(second_prompt[0, second_plen - P_std:second_plen]) \
            == cfg.prompt_ids("english")


def test_conditioned_longform_initial_prompt_first_window(rng):
    from sar_tpu.evaluation import fallback as fb
    cfg, params, tok = _world()
    audio = (rng.standard_normal(int(0.5 * 16000)) * 0.1).astype(np.float32)
    seen = []
    orig = fb.FallbackTranscriber.__call__

    def spy(self, mel, n_valid=None, prompt=None, prompt_len=None):
        seen.append(prompt_len)
        return orig(self, mel, n_valid=n_valid, prompt=prompt,
                    prompt_len=prompt_len)

    fb.FallbackTranscriber.__call__ = spy
    try:
        text = transcribe_long(audio, cfg, params, tok, language="english",
                               max_new_tokens=6, chunk_seconds=0.6,
                               initial_prompt="hello world")
    finally:
        fb.FallbackTranscriber.__call__ = orig
    assert isinstance(text, str)
    P_std = len(cfg.prompt_ids("english"))
    assert seen[0] > P_std       # first window prompt includes the context


class _FakeTranscriber:
    """Scripted FallbackTranscriber stand-in: returns canned rows per
    window and records the prompts it was called with."""

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
        entry = _FakeTranscriber.script[i]
        text, ids = entry[0], entry[1]
        temp = entry[2] if len(entry) > 2 else 0.0
        row = {"temperature": temp, "avg_logprob": -0.1,
               "no_speech_prob": 0.0, "compression_ratio": 1.0,
               "ids": list(ids)}
        return [text], [row]


class _LetterTok:
    """whisper-test's timestamp ids overlap CharTokenizer's byte range;
    this maps every id to a letter so segment text is observable."""

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + int(i) % 26) for i in ids)


def test_timestamp_seek_advances_by_closed_segment(monkeypatch):
    """openai's window-advance rule: the window is consumed up to the last
    CLOSED segment's end; a trailing open segment after closed ones is
    dropped (and excluded from text/context); windows without timestamps
    consume the whole window."""
    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    tok = _LetterTok()
    ts = lambda s: cfg.no_timestamps_token_id + 1 + round(s / 0.02)  # noqa
    a, b, c, d, e, f = 60, 61, 62, 63, 64, 65   # text ids (< ts_begin)
    _FakeTranscriber.script = [
        # closed [0,2] over [a,b] + OPEN tail [c,d] -> tail dropped, seek 2s
        ("raw0", [ts(0.0), a, b, ts(2.0), ts(2.0), c, d]),
        # closed [0,1] over [e] -> seek 1s further
        ("raw1", [ts(0.0), e, ts(1.0)]),
        # no timestamps at all -> whole window consumed
        ("raw2", [f]),
    ]
    _FakeTranscriber.calls = []
    import sar_tpu.evaluation.fallback as fb
    monkeypatch.setattr(fb, "FallbackTranscriber", _FakeTranscriber)

    audio = np.zeros(5 * 16000, np.float32)
    text, segments = transcribe_long(
        audio, cfg, None, tok, language="english", chunk_seconds=3.0,
        max_new_tokens=8, condition_on_previous_text=True, timestamps=True)
    assert len(_FakeTranscriber.calls) == 3
    # Global segment times prove the seek: window 1 started at 2.0 s (the
    # closed end), NOT 3.0 s (the fixed stride).
    assert segments[0][:2] == (0.0, 2.0)
    assert segments[1][:2] == (2.0, 3.0)
    assert segments[2][:2] == (None, None)
    assert segments[2][2] == tok.decode([f]).strip()
    # The dropped open tail [c, d] is not in the text output...
    assert tok.decode([c]) not in text
    # ...and not in window 1's conditioning context (a, b are).
    prompt1, plen1 = _FakeTranscriber.calls[1]
    ctx_ids = list(prompt1[0, :plen1])
    assert a in ctx_ids and b in ctx_ids
    assert c not in ctx_ids and d not in ctx_ids


def test_timestamp_seek_floor_and_optout(monkeypatch):
    """Near-zero closed ends (< 1 s) keep the fixed stride (stall guard);
    timestamp_seek=False restores fixed strides entirely."""
    import sar_tpu.evaluation.fallback as fb
    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    tok = _LetterTok()
    ts = lambda s: cfg.no_timestamps_token_id + 1 + round(s / 0.02)  # noqa
    _FakeTranscriber.script = [("t", [ts(0.0), 60, ts(0.5)])]
    _FakeTranscriber.calls = []
    monkeypatch.setattr(fb, "FallbackTranscriber", _FakeTranscriber)
    audio = np.zeros(4 * 16000, np.float32)
    transcribe_long(audio, cfg, None, tok, language="english",
                    chunk_seconds=2.0, max_new_tokens=8,
                    condition_on_previous_text=True, timestamps=True)
    assert len(_FakeTranscriber.calls) == 2        # 2 fixed 2 s windows

    # Floor-suppressed seek must NOT drop the open tail (the fixed stride
    # consumes its audio — dropping it would lose that speech forever).
    _FakeTranscriber.script = [("t", [ts(0.0), 60, ts(0.5), ts(0.5), 61])]
    _FakeTranscriber.calls = []
    text, segs = transcribe_long(audio, cfg, None, tok, language="english",
                                 chunk_seconds=2.0, max_new_tokens=8,
                                 condition_on_previous_text=True,
                                 timestamps=True)
    assert len(_FakeTranscriber.calls) == 2        # stride stayed fixed
    assert any(s[2] == tok.decode([61]).strip() for s in segs)  # tail kept

    _FakeTranscriber.script = [("t", [ts(0.0), 60, ts(1.5), ts(1.5), 61,
                                      ts(2.0)])]
    _FakeTranscriber.calls = []
    transcribe_long(audio, cfg, None, tok, language="english",
                    chunk_seconds=2.0, max_new_tokens=8,
                    condition_on_previous_text=True, timestamps=True,
                    timestamp_seek=False)
    assert len(_FakeTranscriber.calls) == 2        # opt-out: fixed strides


def test_carry_initial_prompt_pins_prefix(monkeypatch):
    """carry_initial_prompt keeps the initial-prompt tokens at the front of
    EVERY window's context; without it the initial prompt conditions only
    the first window (and rolling text replaces it)."""
    import sar_tpu.evaluation.fallback as fb
    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    tok = _LetterTok()

    class _EncTok(_LetterTok):
        def encode(self, text, add_special_tokens=False):
            return [50, 51]                      # fixed "initial prompt" ids

    a = 60
    _FakeTranscriber.script = [("w", [a])] * 3
    _FakeTranscriber.calls = []
    monkeypatch.setattr(fb, "FallbackTranscriber", _FakeTranscriber)
    audio = np.zeros(3 * 16000, np.float32)
    transcribe_long(audio, cfg, None, _EncTok(), language="english",
                    chunk_seconds=1.0, max_new_tokens=8,
                    condition_on_previous_text=True,
                    initial_prompt="names", carry_initial_prompt=True)
    assert len(_FakeTranscriber.calls) == 3
    for prompt, plen in _FakeTranscriber.calls:
        ids = list(prompt[0, :plen])
        assert ids[0] == cfg.prev_sot_token_id
        assert ids[1:3] == [50, 51]              # pinned prefix, every window
    # window 2+ also carries the rolling text after the pinned prefix
    p2 = list(_FakeTranscriber.calls[2][0][0, :_FakeTranscriber.calls[2][1]])
    assert a in p2

    # The semantic difference shows at a prompt reset (T > 0.5): carrying
    # keeps the pinned prefix, plain initial_prompt loses everything.
    _FakeTranscriber.script = [("w", [a], 1.0), ("w", [a]), ("w", [a])]
    _FakeTranscriber.calls = []
    transcribe_long(audio, cfg, None, _EncTok(), language="english",
                    chunk_seconds=1.0, max_new_tokens=8,
                    condition_on_previous_text=True,
                    initial_prompt="names", carry_initial_prompt=True)
    p1, plen1 = _FakeTranscriber.calls[1]
    assert list(p1[0, :plen1])[1:3] == [50, 51]   # carried through the reset

    _FakeTranscriber.calls = []
    transcribe_long(audio, cfg, None, _EncTok(), language="english",
                    chunk_seconds=1.0, max_new_tokens=8,
                    condition_on_previous_text=True,
                    initial_prompt="names")
    p1, plen1 = _FakeTranscriber.calls[1]
    ids1 = list(p1[0, :plen1])
    assert 50 not in ids1 and 51 not in ids1      # reset wiped the prompt

    # openai pins the carried prompt even WITHOUT conditioning; the
    # rolling text stays off.
    _FakeTranscriber.script = [("w", [a])] * 3
    _FakeTranscriber.calls = []
    transcribe_long(audio, cfg, None, _EncTok(), language="english",
                    chunk_seconds=1.0, max_new_tokens=8,
                    initial_prompt="names", carry_initial_prompt=True)
    assert len(_FakeTranscriber.calls) == 3
    for prompt, plen in _FakeTranscriber.calls:
        ids = list(prompt[0, :plen])
        assert ids[1:3] == [50, 51]
        assert a not in ids                       # no rolling context


def test_merge_overlapping_ids_matches_hf():
    """The chunk-merge must match the installed transformers
    implementation (tokenization_whisper._find_longest_common_sequence)
    on random overlapping sequences."""
    pytest.importorskip("transformers")
    from transformers.models.whisper.tokenization_whisper import (
        _find_longest_common_sequence)

    from sar_tpu.evaluation.longform import merge_overlapping_ids
    rng = np.random.default_rng(17)
    for trial in range(20):
        base = rng.integers(200, 250, size=rng.integers(20, 60)).tolist()
        # overlapping windows with jittered boundaries + occasional noise
        seqs, i = [], 0
        while i < len(base):
            j = min(len(base), i + int(rng.integers(8, 16)))
            seq = base[i:j]
            if rng.random() < 0.3 and seq:
                seq[rng.integers(0, len(seq))] = int(rng.integers(200, 250))
            seqs.append(seq)
            i = j - int(rng.integers(2, 6))      # overlap 2-5 tokens
            if j == len(base):
                break
        got = merge_overlapping_ids(seqs)
        want = list(map(int, _find_longest_common_sequence(seqs)))
        assert got == want, f"trial {trial}: {got} != {want}"


def test_longform_overlap_merges_tokens(rng):
    """Overlapped batched long-form returns merged text (no crash, one
    string) and the zero-overlap join still works."""
    import jax

    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.models import whisper
    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    audio = (rng.standard_normal(int(2.0 * 16000)) * 0.1).astype(np.float32)
    text = transcribe_long(audio, cfg, params, CharTokenizer(cfg),
                           language="english", max_new_tokens=6,
                           chunk_seconds=0.8, overlap_seconds=0.3)
    assert isinstance(text, str)
