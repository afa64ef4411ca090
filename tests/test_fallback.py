"""Sampled decoding + openai-style temperature fallback.

The reference (and HF short-form generate) has no fallback path; parity
target is openai-whisper's transcribe loop: greedy first, escalate through
sampling temperatures while the result is degenerate (compression ratio /
avg logprob thresholds). Sampling rides the Gumbel-max identity with a
TRACED temperature, so T=0.0 must be bit-identical to plain greedy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.decode.greedy import greedy_decode
from sar_tpu.evaluation.fallback import (compression_ratio, needs_retry,
                                         transcribe_batch_with_fallback)
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal(
        (3, cfg.num_mel_bins, cfg.max_source_positions * 2)), jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    return cfg, params, mel, enc


def test_temperature_zero_is_greedy(setup):
    cfg, params, _, enc = setup
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    plain = greedy_decode(params, enc, cfg, prompt, max_new_tokens=10)
    sampled = greedy_decode(params, enc, cfg, prompt, max_new_tokens=10,
                            temperature=jnp.float32(0.0),
                            rng=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(sampled))


def test_sampling_deterministic_and_varies(setup):
    cfg, params, _, enc = setup
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)

    def run(seed, t):
        return np.asarray(greedy_decode(
            params, enc, cfg, prompt, max_new_tokens=12,
            temperature=jnp.float32(t), rng=jax.random.PRNGKey(seed)))

    a, b = run(1, 1.0), run(1, 1.0)
    np.testing.assert_array_equal(a, b)          # same key -> same draw
    c = run(2, 1.0)
    assert (a != c).any(), "different keys produced identical samples"


def test_with_logprobs_accounting(setup):
    cfg, params, _, enc = setup
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    tokens, sum_lp, n_sc = greedy_decode(params, enc, cfg, prompt,
                                         max_new_tokens=8,
                                         with_logprobs=True)
    tokens, sum_lp, n_sc = (np.asarray(x) for x in (tokens, sum_lp, n_sc))
    P = prompt.shape[0]
    for b in range(tokens.shape[0]):
        body = list(tokens[b, P:])
        gen = (body.index(cfg.eos_token_id) + 1
               if cfg.eos_token_id in body else len(body))
        # openai convention: every chosen token incl. the first EOS scores.
        assert int(n_sc[b]) == gen, (b, n_sc[b], gen)
        assert sum_lp[b] <= 0.0


def test_compression_ratio_and_needs_retry():
    loop = "la la la la la la la la la la la la la la la la"
    assert compression_ratio(loop) > compression_ratio("the quick brown fox")
    assert needs_retry(loop * 8, -0.1)                # repetitive
    assert needs_retry("ok text", -5.0)               # low confidence
    assert not needs_retry("ok text", -0.1)
    assert not needs_retry(loop * 8, -5.0,
                           compression_ratio_threshold=None,
                           logprob_threshold=None)    # thresholds off


class _Tok:
    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def test_fallback_accepts_first_pass(setup):
    cfg, params, mel, _ = setup
    texts, info = transcribe_batch_with_fallback(
        cfg, params, mel, _Tok(), language="english", max_new_tokens=6,
        compression_ratio_threshold=None, logprob_threshold=None,
        flash=False, kv_int8=True)
    assert all(i["temperature"] == 0.0 for i in info)
    # and equals plain greedy text
    from sar_tpu.decode.greedy import transcribe_tokens
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    ref = greedy_decode(params, enc, cfg, prompt, max_new_tokens=6,
                        cross_kv_int8=True, self_kv_int8=True)
    ids = transcribe_tokens(ref, cfg, prompt_len=int(prompt.shape[0]))
    assert texts == [_Tok().decode(r) for r in ids]


def test_fallback_escalates_to_last_temperature(setup):
    cfg, params, mel, _ = setup
    texts, info = transcribe_batch_with_fallback(
        cfg, params, mel, _Tok(), language="english", max_new_tokens=6,
        temperatures=(0.0, 0.5, 1.0),
        logprob_threshold=1e9,        # impossible -> every pass "fails"
        compression_ratio_threshold=None, flash=False)
    assert all(i["temperature"] == 1.0 for i in info)
    assert all(isinstance(t, str) for t in texts)


def test_no_speech_prob_capture(setup):
    cfg, params, _, enc = setup
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    tokens, ns = greedy_decode(params, enc, cfg, prompt, max_new_tokens=6,
                               with_no_speech=True)
    ns = np.asarray(ns)
    assert ns.shape == (3,)
    assert ((ns >= 0.0) & (ns <= 1.0)).all()
    # the raw-logit softmax at the SOT step is decode-length independent
    _, ns2 = greedy_decode(params, enc, cfg, prompt, max_new_tokens=9,
                           with_no_speech=True)
    np.testing.assert_allclose(ns, np.asarray(ns2), rtol=1e-5)


def test_should_skip_silence_rule():
    from sar_tpu.evaluation.fallback import should_skip_silence
    silent = {"no_speech_prob": 0.9, "avg_logprob": -2.0}
    confident = {"no_speech_prob": 0.9, "avg_logprob": -0.2}
    speech = {"no_speech_prob": 0.1, "avg_logprob": -2.0}
    assert should_skip_silence(silent)
    assert not should_skip_silence(confident)      # confident text overrules
    assert not should_skip_silence(speech)
    assert not should_skip_silence(silent, no_speech_threshold=None)
    # with the logprob overrule disabled, confidence cannot save it
    assert should_skip_silence(confident, logprob_threshold=None)


def test_fallback_reports_no_speech(setup):
    cfg, params, mel, _ = setup
    _, info = transcribe_batch_with_fallback(
        cfg, params, mel, _Tok(), language="english", max_new_tokens=6,
        compression_ratio_threshold=None, logprob_threshold=None,
        flash=False)
    assert all(0.0 <= i["no_speech_prob"] <= 1.0 for i in info)


def test_fallback_n_valid_limits_escalation(setup):
    cfg, params, mel, _ = setup
    texts, info = transcribe_batch_with_fallback(
        cfg, params, mel, _Tok(), language="english", max_new_tokens=6,
        temperatures=(0.0, 1.0), logprob_threshold=1e9,
        compression_ratio_threshold=None, flash=False, n_valid=2)
    assert info[2] is None and texts[2] is None    # padding row untouched
    assert all(i["temperature"] == 1.0 for i in info[:2])


def test_longform_fallback_end_to_end(setup):
    cfg, params, _, _ = setup
    from sar_tpu.evaluation.longform import transcribe_long
    rng = np.random.default_rng(11)
    audio = rng.standard_normal(4 * 16000).astype(np.float32) * 0.1
    # tiny test model: window = max_source_positions*2 hops = 0.64 s
    text = transcribe_long(audio, cfg, params, _Tok(), language="english",
                           max_new_tokens=6, chunk_seconds=0.6,
                           batch_size=4, fallback=True,
                           no_speech_threshold=None)
    assert isinstance(text, str)
    # gate everything out -> empty transcript
    text2 = transcribe_long(audio, cfg, params, _Tok(), language="english",
                            max_new_tokens=6, chunk_seconds=0.6,
                            batch_size=4, fallback=True,
                            no_speech_threshold=-1.0,
                            logprob_threshold=None)
    assert text2 == ""


def test_evaluator_fallback_mode(setup):
    cfg, params, _, _ = setup
    from sar_tpu.data.loader import DataLoader
    from sar_tpu.data.synthetic import SyntheticASRDataset
    from sar_tpu.evaluation.evaluator import ASREvaluator

    ds = SyntheticASRDataset(cfg, size=6, language="english", seed=0)
    tok = ds.tokenizer

    from sar_tpu.data.collate import create_collator
    loader = DataLoader(ds, batch_size=3,
                        collator=create_collator(cfg.sot_token_id,
                                                 pad_to_length=8),
                        shuffle=False, drop_last=False, num_workers=0)
    ev = ASREvaluator(cfg, params, tok, language="english",
                      max_new_tokens=6, kv_int8=True, flash=False,
                      fallback=True)
    out = ev.evaluate(loader)
    assert out["num_samples"] == 6
    assert 0.0 <= out["wer"]
    # beams force-disable fallback with a warning, not an error
    ev2 = ASREvaluator(cfg, params, tok, language="english",
                      max_new_tokens=6, num_beams=2, flash=False,
                      fallback=True)
    assert ev2.fallback is False


def test_needs_retry_silence_override():
    loop = "la la la la " * 8
    # silence (high no-speech prob) never retries, whatever the text
    assert needs_retry(loop, -5.0)
    assert not needs_retry(loop, -5.0, no_speech_prob=0.9,
                           no_speech_threshold=0.6)
    assert needs_retry(loop, -5.0, no_speech_prob=0.3,
                       no_speech_threshold=0.6)


def test_task_threading_prompt_ids():
    """task="translate" swaps exactly the task token in every prompt
    builder; unknown tasks are rejected."""
    import pytest

    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    tr = cfg.prompt_ids("german")
    xl = cfg.prompt_ids("german", "translate")
    assert len(tr) == len(xl)
    assert [a for a, b in zip(tr, xl) if a != b] == [cfg.transcribe_token_id]
    assert xl[2] == cfg.translate_token_id
    with pytest.raises(ValueError):
        cfg.prompt_ids("german", "interpret")


def test_translate_task_decodes(rng):
    """batch_transcribe(task=translate) runs the compiled pipeline with the
    translate prompt (random weights; exercises the plumbing)."""
    import jax

    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.evaluation.evaluator import batch_transcribe
    from sar_tpu.models import whisper
    from sar_tpu.models.config import get_config
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    texts = batch_transcribe([audio], cfg, params, CharTokenizer(cfg),
                             language="german", max_new_tokens=6,
                             task="translate")
    assert len(texts) == 1 and isinstance(texts[0], str)


def test_best_of_picks_highest_avg_logprob(setup):
    """best_of=3 at T>0: the accepted row must score >= a single-candidate
    run's row (the winner is the per-row argmax over candidates, and
    candidate 0's rng matches the best_of=1 run)."""
    cfg, params, mel, _ = setup
    kw = dict(language="english", max_new_tokens=6,
              temperatures=(0.7,),           # sampled pass only
              logprob_threshold=None, compression_ratio_threshold=None,
              flash=False, seed=11)
    _, one = transcribe_batch_with_fallback(cfg, params, mel, _Tok(),
                                            best_of=1, **kw)
    _, three = transcribe_batch_with_fallback(cfg, params, mel, _Tok(),
                                              best_of=3, **kw)
    for a, b in zip(three, one):
        assert a["avg_logprob"] >= b["avg_logprob"] - 1e-6


def test_best_of_ignored_at_temperature_zero(setup):
    """T=0 passes decode once regardless of best_of (greedy is
    deterministic) — results identical to best_of=1."""
    cfg, params, mel, _ = setup
    kw = dict(language="english", max_new_tokens=6, temperatures=(0.0,),
              logprob_threshold=None, compression_ratio_threshold=None,
              flash=False)
    t1, i1 = transcribe_batch_with_fallback(cfg, params, mel, _Tok(),
                                            best_of=1, **kw)
    t5, i5 = transcribe_batch_with_fallback(cfg, params, mel, _Tok(),
                                            best_of=5, **kw)
    assert t1 == t5
    assert [r["avg_logprob"] for r in i1] == [r["avg_logprob"] for r in i5]


def test_no_speech_pos_tracks_sot_in_conditioned_prompts(setup):
    """With a <|startofprev|>+context prefix, p(<|nospeech|>) must be read
    at the <|sot|> step (openai probs_at_sot), not at buffer position 0."""
    import jax.numpy as jnp

    from sar_tpu.decode.greedy import greedy_decode_from_cache
    cfg, params, mel, enc = setup
    std = cfg.prompt_ids("english")
    ctx = [cfg.prev_sot_token_id, 70, 71]
    buf = jnp.asarray([ctx + std] * mel.shape[0], jnp.int32)
    cache = whisper.init_cache(params, enc, cfg, max_len=buf.shape[1] + 4)
    _, ns_at_sot = greedy_decode_from_cache(
        params, cache, cfg, buf, with_no_speech=True, segment=0,
        no_speech_pos=len(ctx))
    cache = whisper.init_cache(params, enc, cfg, max_len=buf.shape[1] + 4)
    _, ns_at_0 = greedy_decode_from_cache(
        params, cache, cfg, buf, with_no_speech=True, segment=0,
        no_speech_pos=0)
    # Teacher-forced truth at the SOT step.
    logits = whisper.decode_train(params, enc, buf, cfg)
    want = jax.nn.softmax(np.asarray(logits, np.float32), -1)[
        :, len(ctx), cfg.no_speech_token_id]
    np.testing.assert_allclose(np.asarray(ns_at_sot), want,
                               rtol=2e-2, atol=2e-3)
    assert not np.allclose(np.asarray(ns_at_sot), np.asarray(ns_at_0))


def test_max_gen_tokens_caps_generation(setup):
    """With a prompt buffer wider than the live prompt, max_gen_tokens
    bounds BOTH the kept ids and the logprob accounting."""
    import jax.numpy as jnp

    from sar_tpu.decode.greedy import (greedy_decode_from_cache,
                                       transcribe_tokens)
    cfg, params, mel, enc = setup
    std = cfg.prompt_ids("english")
    width = len(std) + 6                       # budget for wider prompts
    buf = np.full((mel.shape[0], width), cfg.eos_token_id, np.int32)
    buf[:, :len(std)] = std
    total = width + 8
    cache = whisper.init_cache(params, enc, cfg, max_len=total)
    tokens, sum_lp, n_sc = greedy_decode_from_cache(
        params, cache, cfg, jnp.asarray(buf), prompt_len=jnp.int32(len(std)),
        with_logprobs=True, segment=0, max_gen_tokens=3)
    rows = transcribe_tokens(tokens, cfg, prompt_len=len(std))
    assert all(len(r) <= 3 for r in rows)
    assert np.asarray(n_sc).max() <= 3
