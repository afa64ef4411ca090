"""Streaming transcription: dynamic forced-prefix decode + LocalAgreement.

New capability beyond the reference (no streaming path exists there; long
clips are dropped, /root/reference/src/data/dataset.py:59-77)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.data.tokenizer import CharTokenizer
from sar_tpu.decode import greedy_decode, transcribe_tokens
from sar_tpu.evaluation.streaming import StreamingTranscriber, common_prefix_len
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config
from sar_tpu.ops import mel as mel_ops


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params, CharTokenizer(cfg)


def _stream(cfg, params, tok, **kw):
    return StreamingTranscriber(cfg, params, tok, language="english", **kw)


def test_common_prefix_len():
    assert common_prefix_len([1, 2, 3], [1, 2, 4]) == 2
    assert common_prefix_len([], [1]) == 0
    assert common_prefix_len([1, 2], [1, 2, 3]) == 2


def test_one_shot_matches_offline_greedy(setup, rng):
    """A single full-window feed must reproduce the plain compiled greedy
    decode bit-for-bit (the dynamic prompt_len path with an empty committed
    prefix IS the static path)."""
    cfg, params, tok = setup
    st = _stream(cfg, params, tok)
    audio = rng.standard_normal(st.window_samples).astype(np.float32)
    st.feed(audio)
    got = st._last_hyp

    feats = mel_ops.log_mel_spectrogram(jnp.asarray(audio[None]),
                                        cfg.num_mel_bins)
    feats = feats[:, :, :cfg.num_audio_frames]
    enc = whisper.encode(params, feats, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    tokens = greedy_decode(params, enc, cfg, prompt,
                           max_new_tokens=cfg.max_target_positions)
    want = transcribe_tokens(tokens, cfg, prompt_len=int(prompt.shape[0]))[0]
    assert got == want


def test_forced_prefix_reproduces_continuation(setup, rng):
    """Greedy forced on a prefix of its own output must continue
    identically — the invariant the committed transcript rides."""
    cfg, params, tok = setup
    st = _stream(cfg, params, tok)
    audio = rng.standard_normal(st.window_samples // 2).astype(np.float32)
    st.feed(audio)
    full = st._last_hyp
    assert len(full) > 2, "random decode emitted EOS immediately; reseed"
    st._committed = full[:2]
    assert st._decode_window(st._audio) == full


def test_no_retrace_across_updates(setup, rng):
    """Growing audio + growing committed prefix reuse ONE compiled program
    pair (the whole point of the traced prompt_len)."""
    cfg, params, tok = setup
    st = _stream(cfg, params, tok)
    chunk = st.window_samples // 4
    for i in range(3):
        st.feed(rng.standard_normal(chunk).astype(np.float32))
    assert st._prep._cache_size() == 1
    assert st._dec._cache_size() == 1


def test_committed_text_is_monotonic(setup, rng):
    cfg, params, tok = setup
    st = _stream(cfg, params, tok)
    chunk = st.window_samples // 4
    prev: list[int] = []
    for _ in range(3):
        st.feed(rng.standard_normal(chunk).astype(np.float32))
        cur = list(st._committed)
        assert cur[:len(prev)] == prev     # never retracts committed ids
        prev = cur
    text = st.finalize()
    assert isinstance(text, str)
    assert st._committed[:len(prev)] == prev


def test_finalize_without_audio_returns_empty(setup):
    """finalize() on a fresh/reset stream must not decode the silent
    zero window (real checkpoints hallucinate on silence)."""
    cfg, params, tok = setup
    st = _stream(cfg, params, tok)
    assert st.finalize() == ""
    assert st._last_hyp is None            # no decode happened


def test_feed_after_finalize_does_not_crash(setup, rng):
    """finalize() commits the full hypothesis (may exceed the forced-prefix
    cap); a later feed must cap it instead of overflowing the buffer."""
    cfg, params, tok = setup
    st = _stream(cfg, params, tok)
    st.feed(rng.standard_normal(st.window_samples // 2).astype(np.float32))
    st.finalize()
    st._committed = list(range(st._total))  # worst case: over-long commit
    st.feed(rng.standard_normal(st.window_samples // 4).astype(np.float32))
    assert isinstance(st.text, str)


def test_window_rollover(setup, rng):
    cfg, params, tok = setup
    st = _stream(cfg, params, tok)
    n = st.window_samples
    st.feed(rng.standard_normal(2 * n + n // 2).astype(np.float32))
    assert len(st._audio) <= n             # two windows rolled over
    assert len(st._segments) <= 2          # silence-only windows may be empty
    out = st.finalize()
    assert isinstance(out, str)
    st.reset()
    assert st.text == ""
