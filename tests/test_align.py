"""Word-level timestamp alignment (cross-attention DTW).

Parity target is openai-whisper's timing pipeline (find_alignment /
add_word_timestamps); the reference has no timestamp surface at all. The
DTW itself is validated against a brute-force dynamic program, and the
native C++ path (native/dtw.cpp) must match the numpy twin exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.decode.align import (_dtw_numpy, align_words,
                                  default_alignment_heads, dtw_path,
                                  median_filter, split_words,
                                  words_from_matrix)
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config


def _brute_force_best_cost(x):
    """Min path cost over monotone (diag/down/right) paths, O(N*M) DP
    without the tie-breaking subtleties — checks optimality only."""
    N, M = x.shape
    best = np.full((N, M), np.inf)
    best[0, 0] = x[0, 0]
    for i in range(N):
        for j in range(M):
            if i == 0 and j == 0:
                continue
            c = np.inf
            if i > 0:
                c = min(c, best[i - 1, j])
            if j > 0:
                c = min(c, best[i, j - 1])
            if i > 0 and j > 0:
                c = min(c, best[i - 1, j - 1])
            best[i, j] = x[i, j] + c
    return best[N - 1, M - 1]


def _path_cost(x, ti, tj):
    # The DP counts each visited cell once; boundary moves keep the path
    # inside the matrix.
    assert ti[0] == 0 and tj[0] == 0
    assert ti[-1] == x.shape[0] - 1 and tj[-1] == x.shape[1] - 1
    seen = set()
    cost = 0.0
    for i, j in zip(ti, tj):
        assert (i, j) not in seen
        seen.add((i, j))
        cost += x[i, j]
    return cost


def test_dtw_optimal_and_monotone():
    rng = np.random.default_rng(0)
    for shape in [(1, 1), (1, 7), (5, 1), (4, 9), (9, 4), (17, 23)]:
        x = rng.standard_normal(shape).astype(np.float32)
        ti, tj = _dtw_numpy(x)
        di, dj = np.diff(ti), np.diff(tj)
        assert ((di >= 0) & (di <= 1)).all() and ((dj >= 0) & (dj <= 1)).all()
        assert ((di + dj) > 0).all()
        assert _path_cost(x, ti, tj) == pytest.approx(
            _brute_force_best_cost(x), abs=1e-4)


def test_dtw_native_matches_numpy():
    from sar_tpu.utils import native
    if not native.native_available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(1)
    for shape in [(1, 5), (8, 8), (21, 64), (64, 21)]:
        x = rng.standard_normal(shape).astype(np.float32)
        got = native.dtw(x)
        assert got is not None
        want = _dtw_numpy(x)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


def test_median_filter_matches_numpy_reference():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 25)).astype(np.float32)
    got = np.asarray(median_filter(jnp.asarray(x), 7))
    pad = 3
    xp = np.concatenate([x[:, 1:pad + 1][:, ::-1], x,
                         x[:, -pad - 1:-1][:, ::-1]], axis=1)
    want = np.stack([np.median(xp[:, j:j + 7], axis=1)
                     for j in range(x.shape[1])], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # width 1 / too-short input: identity
    np.testing.assert_array_equal(np.asarray(median_filter(jnp.asarray(x), 1)), x)


class _Tok:
    """Byte-ish tokenizer: id = ord(char); decode joins chars."""

    def decode(self, ids):
        return "".join(chr(i) for i in ids)


def test_split_words_spaces_and_counts():
    text = "the quick  fox"
    ids = [ord(c) for c in text]
    words, counts = split_words(ids, _Tok())
    assert words == ["the", "quick", "fox"]
    assert sum(counts) == len(ids)


def test_words_from_matrix_synthetic_diagonal():
    # 6 tokens ("ab cd", 5 ids + EOS row), 12 frames; saliency on a banded
    # diagonal => words in order with monotone, sensible boundaries.
    ids = [ord(c) for c in "ab cd"]
    n = len(ids) + 1
    S = 12
    m = np.full((n, S), -1.0, np.float32)
    for k in range(n):
        j = int(round(k * (S - 1) / (n - 1)))
        m[k, max(0, j - 1):j + 2] = 1.0
    words = words_from_matrix(m, ids, _Tok())
    assert [w["word"] for w in words] == ["ab", "cd"]
    starts = [w["start"] for w in words]
    assert starts == sorted(starts)
    for w in words:
        assert 0.0 <= w["start"] <= w["end"] <= S * 0.02


@pytest.fixture(scope="module")
def model():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal(
        (2, cfg.num_mel_bins, cfg.max_source_positions * 2)), jnp.float32)
    return cfg, params, mel


def test_default_alignment_heads(model):
    cfg, _, _ = model
    heads = default_alignment_heads(cfg)
    assert heads == ((1, 0), (1, 1), (1, 2), (1, 3))


def test_align_words_end_to_end(model):
    from sar_tpu.decode.greedy import greedy_decode, transcribe_tokens
    cfg, params, mel = model
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    tokens = greedy_decode(params, enc, cfg, prompt, max_new_tokens=10)
    ids_rows = transcribe_tokens(tokens, cfg, prompt_len=int(prompt.shape[0]))
    out = align_words(params, mel, tokens, cfg, _Tok(),
                      prompt_len=int(prompt.shape[0]), enc_out=enc,
                      num_frames=[cfg.max_source_positions] * 2)
    assert len(out) == 2
    for row, ids in zip(out, ids_rows):
        text = _Tok().decode(ids)
        joined = "".join(w["word"] for w in row)
        assert "".join(joined.split()) == "".join(text.split())
        starts = [w["start"] for w in row]
        assert starts == sorted(starts)
        for w in row:
            assert 0.0 <= w["start"] <= w["end"]


def test_align_words_empty_row(model):
    cfg, params, mel = model
    P = len(cfg.prompt_ids("english"))
    # A buffer that is all-EOS after the prompt: no words.
    tokens = np.full((2, 16), cfg.eos_token_id, np.int32)
    tokens[:, :P] = cfg.prompt_ids("english")
    out = align_words(params, mel, jnp.asarray(tokens), cfg, _Tok(),
                      prompt_len=P)
    assert out == [[], []]


def test_alignment_heads_config_roundtrip_and_priority():
    import dataclasses

    from sar_tpu.models.config import WhisperConfig
    cfg = get_config("whisper-test")
    cfg2 = dataclasses.replace(cfg, alignment_heads=[[0, 1], [1, 2]])
    # JSON lists coerce to hashable tuples (static jit argument)
    assert cfg2.alignment_heads == ((0, 1), (1, 2))
    hash(cfg2)
    back = WhisperConfig.from_json(cfg2.to_json())
    assert back.alignment_heads == ((0, 1), (1, 2))
    assert default_alignment_heads(cfg2) == ((0, 1), (1, 2))
    assert WhisperConfig.from_json(cfg.to_json()).alignment_heads is None


def test_alignment_heads_from_hf_shapes():
    from sar_tpu.models.convert import alignment_heads_from_hf

    class _G:
        alignment_heads = [[3, 1], [4, 2]]

    class _C:
        alignment_heads = None
        generation_config = _G()

    class _N:
        pass

    assert alignment_heads_from_hf(_C()) == ((3, 1), (4, 2))
    assert alignment_heads_from_hf(_N()) is None


def test_longform_word_timestamps_global_offsets(model):
    from sar_tpu.evaluation.longform import transcribe_long
    cfg, params, _ = model
    rng = np.random.default_rng(13)
    # test window = 0.64 s; ~4 chunks of 0.6 s with batch 2 -> two groups
    audio = rng.standard_normal(int(2.4 * 16000)).astype(np.float32) * 0.1
    text, words = transcribe_long(audio, cfg, params, _Tok(),
                                  language="english", max_new_tokens=6,
                                  chunk_seconds=0.6, batch_size=2,
                                  word_timestamps=True)
    assert isinstance(text, str)
    starts = [w["start"] for w in words]
    assert starts == sorted(starts)          # global clock is monotone
    for w in words:
        assert 0.0 <= w["start"] <= w["end"] <= 2.5
    # joined words reassemble the joined text (modulo whitespace)
    joined = "".join(w["word"] for w in words)
    assert "".join(joined.split()) == "".join(text.split())


def test_longform_word_timestamps_with_fallback(model):
    from sar_tpu.evaluation.longform import transcribe_long
    cfg, params, _ = model
    rng = np.random.default_rng(14)
    audio = rng.standard_normal(int(1.2 * 16000)).astype(np.float32) * 0.1
    text, words = transcribe_long(audio, cfg, params, _Tok(),
                                  language="english", max_new_tokens=6,
                                  chunk_seconds=0.6, batch_size=2,
                                  fallback=True, no_speech_threshold=None,
                                  word_timestamps=True)
    assert isinstance(text, str)
    joined = "".join(w["word"] for w in words)
    assert "".join(joined.split()) == "".join(text.split())


def test_word_probabilities(model):
    """Word dicts carry openai's probability: the mean teacher-forced
    next-token probability over the word's tokens, in (0, 1]."""
    from sar_tpu.decode.align import split_words
    from sar_tpu.decode.greedy import greedy_decode, transcribe_tokens
    cfg, params, mel = model
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    prompt_len = int(prompt.shape[0])
    tokens = greedy_decode(params, enc, cfg, prompt, max_new_tokens=10)
    words = align_words(params, mel, tokens, cfg, _Tok(),
                        prompt_len=prompt_len, enc_out=enc)
    rows = [w for row in words for w in row]
    assert rows, "expected at least one aligned word"
    assert all(0.0 < w["probability"] <= 1.0 for w in rows)
    # Cross-check the first word against decode_train's softmax directly.
    logits = whisper.decode_train(params, enc, jnp.asarray(tokens), cfg)
    p = np.asarray(jax.nn.softmax(np.asarray(logits, np.float32), -1))
    ids0 = transcribe_tokens(tokens, cfg, prompt_len=prompt_len)[0]
    tok_p = [p[0, prompt_len - 1 + i, ids0[i]] for i in range(len(ids0))]
    _, counts = split_words(ids0, _Tok())
    want = float(np.mean(tok_p[:counts[0]]))
    got = words[0][0]["probability"]
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)
