"""Compiled greedy decode vs a naive recompute-everything reference loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.decode import greedy_decode, transcribe_tokens
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _naive_greedy(params, enc_out, cfg, prompt, total):
    """Recompute the full teacher-forced pass each step (no cache)."""
    B = enc_out.shape[0]
    toks = np.tile(np.asarray(prompt, np.int32)[None], (B, 1))
    finished = np.zeros((B,), bool)
    while toks.shape[1] < total:
        logits = whisper.decode_train(params, enc_out, jnp.asarray(toks), cfg)
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1), np.int32)
        nxt = np.where(finished, cfg.eos_token_id, nxt)
        finished |= nxt == cfg.eos_token_id
        toks = np.concatenate([toks, nxt[:, None]], axis=1)
        if finished.all():
            break
    # Pad to total with EOS for comparison.
    pad = total - toks.shape[1]
    if pad:
        toks = np.pad(toks, [(0, 0), (0, pad)], constant_values=cfg.eos_token_id)
    return toks


def test_greedy_matches_naive(setup, rng):
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins,
                                           cfg.max_source_positions * 2)), jnp.float32)
    enc_out = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)
    out = greedy_decode(params, enc_out, cfg, prompt, max_new_tokens=12)
    naive = _naive_greedy(params, enc_out, cfg, cfg.prompt_ids("hindi"),
                          out.shape[1])
    np.testing.assert_array_equal(np.asarray(out), naive)


def test_greedy_respects_max_target_positions(setup, rng):
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((1, cfg.num_mel_bins,
                                           cfg.max_source_positions * 2)), jnp.float32)
    enc_out = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("telugu"), jnp.int32)
    out = greedy_decode(params, enc_out, cfg, prompt, max_new_tokens=10_000)
    assert out.shape[1] <= cfg.max_target_positions


def test_transcribe_tokens_strips_prompt_and_eos(setup):
    cfg, _ = setup
    row = [4, 5, 105, 106, 42, 43, 44, cfg.eos_token_id, cfg.eos_token_id]
    ids = transcribe_tokens(np.asarray([row]), cfg, prompt_len=4)
    assert ids == [[42, 43, 44]]


def test_greedy_under_jit(setup, rng):
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins,
                                           cfg.max_source_positions * 2)), jnp.float32)
    prompt = jnp.asarray(cfg.prompt_ids("italian"), jnp.int32)

    @jax.jit
    def run(params, mel):
        enc_out = whisper.encode(params, mel, cfg)
        return greedy_decode(params, enc_out, cfg, prompt, max_new_tokens=8)

    out = run(params, mel)
    eager = greedy_decode(params, whisper.encode(params, mel, cfg), cfg, prompt,
                          max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(eager))


def test_int8_cross_kv_close_to_bf16(setup, rng):
    """int8 cross-KV decode: logits of the first step must be close, token
    agreement high (random weights = worst case for tie-breaking)."""
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((4, cfg.num_mel_bins,
                                           cfg.max_source_positions * 2)), jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)

    cache_bf = whisper.init_cache(params, enc, cfg, max_len=16)
    cache_q = whisper.init_cache(params, enc, cfg, max_len=16,
                                 cross_kv_int8=True)
    tok = jnp.full((4,), cfg.sot_token_id, jnp.int32)
    logits_bf, _ = whisper.decode_step(params, tok, jnp.int32(0), cache_bf, cfg)
    logits_q, _ = whisper.decode_step(params, tok, jnp.int32(0), cache_q, cfg)
    # int8 per-row scales keep logits within a tight tolerance.
    err = np.abs(np.asarray(logits_bf) - np.asarray(logits_q)).max()
    assert err < 0.05, err

    a = greedy_decode(params, enc, cfg, prompt, max_new_tokens=10)
    b = greedy_decode(params, enc, cfg, prompt, max_new_tokens=10,
                      cross_kv_int8=True)
    agreement = (np.asarray(a) == np.asarray(b)).mean()
    assert agreement > 0.9, agreement


def test_suppress_and_begin_suppress(setup, rng):
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins,
                                           cfg.max_source_positions * 2)), jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)
    base = greedy_decode(params, enc, cfg, prompt, max_new_tokens=8)
    P = prompt.shape[0]
    first = {int(t) for t in np.asarray(base)[:, P]}
    # Suppressing the tokens the model would emit first must change them.
    out = greedy_decode(params, enc, cfg, prompt, max_new_tokens=8,
                        begin_suppress_ids=tuple(first))
    new_first = {int(t) for t in np.asarray(out)[:, P]}
    assert new_first.isdisjoint(first)
    # Global suppression bans the ids everywhere.
    out2 = greedy_decode(params, enc, cfg, prompt, max_new_tokens=8,
                         suppress_ids=tuple(first))
    gen = np.asarray(out2)[:, P:]
    gen = gen[gen != cfg.eos_token_id]
    assert not (set(gen.tolist()) & first)


def test_scores_int8_agreement(setup, rng):
    """Opt-in int8-MXU attention scores: high token agreement vs bf16 scores,
    and a clear error without an int8 KV cache."""
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)), jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)
    base = greedy_decode(params, enc, cfg, prompt, max_new_tokens=16,
                         cross_kv_int8=True, self_kv_int8=True)
    q = greedy_decode(params, enc, cfg, prompt, max_new_tokens=16,
                      cross_kv_int8=True, self_kv_int8=True, scores_int8=True)
    agreement = (np.asarray(base) == np.asarray(q)).mean()
    assert agreement > 0.8, agreement
    with pytest.raises(ValueError, match="int8 KV"):
        greedy_decode(params, enc, cfg, prompt, max_new_tokens=4,
                      scores_int8=True)


def test_dynamic_prompt_len_matches_static(setup, rng):
    """A traced prompt_len over a wider (junk-padded) buffer must reproduce
    the static-prompt decode exactly — the streaming path's foundation."""
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins,
                                           cfg.max_source_positions * 2)), jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = np.asarray(cfg.prompt_ids("hindi"), np.int32)
    P = len(prompt)
    static = greedy_decode(params, enc, cfg, jnp.asarray(prompt),
                           max_new_tokens=12)
    total = static.shape[1]
    # Buffer wider than the true prompt, junk beyond position P.
    buf = np.full((2, total), 99, np.int32)
    buf[:, :P] = prompt
    dyn = greedy_decode(params, enc, cfg, jnp.asarray(buf),
                        max_new_tokens=0, prompt_len=jnp.int32(P))
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(static))


def test_greedy_segmented_matches_unsegmented(setup):
    """segment>0 bounds each step's self-attention read to the segment's
    static high-water mark; tokens must be bit-identical to segment=0."""
    cfg, params = setup
    rng = np.random.default_rng(31)
    mel = jnp.asarray(rng.standard_normal(
        (2, cfg.num_mel_bins, cfg.max_source_positions * 2)), jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    ref = greedy_decode(params, enc, cfg, prompt, max_new_tokens=12, segment=0)
    for seg in (3, 5):
        out = greedy_decode(params, enc, cfg, prompt, max_new_tokens=12,
                            segment=seg)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out),
                                      err_msg=f"segment={seg}")
    # And with int8 KV (scale rows sliced alongside the cache).
    ref8 = greedy_decode(params, enc, cfg, prompt, max_new_tokens=12,
                         cross_kv_int8=True, self_kv_int8=True, segment=0)
    out8 = greedy_decode(params, enc, cfg, prompt, max_new_tokens=12,
                         cross_kv_int8=True, self_kv_int8=True, segment=4)
    np.testing.assert_array_equal(np.asarray(ref8), np.asarray(out8))
