"""Beam search: K=1 equivalence with greedy, score dominance, EOS handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.decode import greedy_decode
from sar_tpu.decode.beam import beam_decode
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config


@pytest.fixture(scope="module")
def setup(rng):
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)), jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)
    return cfg, params, enc, prompt


def _seq_logprob(params, enc, cfg, tokens_row, prompt_len):
    """Sum of per-token log-probs of a generated row (teacher-forced)."""
    toks = tokens_row[None]
    logits = whisper.decode_train(params, enc, toks, cfg)
    logp = jax.nn.log_softmax(np.asarray(logits, np.float32), -1)
    total, done = 0.0, False
    for t in range(prompt_len - 1, toks.shape[1] - 1):
        nxt = int(toks[0, t + 1])
        total += float(logp[0, t, nxt])
        if nxt == cfg.eos_token_id:
            done = True
            break
    return total, done


def test_beam1_matches_greedy(setup):
    cfg, params, enc, prompt = setup
    g = greedy_decode(params, enc, cfg, prompt, max_new_tokens=10)
    b = beam_decode(params, enc, cfg, prompt, num_beams=1, max_new_tokens=10)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(b))


def test_beam_score_dominates_greedy(setup):
    cfg, params, enc, prompt = setup
    P = prompt.shape[0]
    g = greedy_decode(params, enc, cfg, prompt, max_new_tokens=8)
    b = beam_decode(params, enc, cfg, prompt, num_beams=4, max_new_tokens=8)
    for i in range(2):
        enc_i = enc[i:i + 1]
        gs, _ = _seq_logprob(params, enc_i, cfg, np.asarray(g)[i], P)
        bs, _ = _seq_logprob(params, enc_i, cfg, np.asarray(b)[i], P)
        assert bs >= gs - 1e-3, f"beam worse than greedy: {bs} < {gs}"


def test_beam_prompt_preserved(setup):
    cfg, params, enc, prompt = setup
    b = beam_decode(params, enc, cfg, prompt, num_beams=3, max_new_tokens=6)
    np.testing.assert_array_equal(
        np.asarray(b)[:, :prompt.shape[0]],
        np.tile(np.asarray(prompt), (2, 1)))


def test_beam_under_jit(setup):
    cfg, params, enc, prompt = setup
    f = jax.jit(lambda p, e: beam_decode(p, e, cfg, prompt, num_beams=2,
                                         max_new_tokens=6))
    a = f(params, enc)
    b = beam_decode(params, enc, cfg, prompt, num_beams=2, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_beam_int8_kv(setup):
    cfg, params, enc, prompt = setup
    a = beam_decode(params, enc, cfg, prompt, num_beams=3, max_new_tokens=8)
    b = beam_decode(params, enc, cfg, prompt, num_beams=3, max_new_tokens=8,
                    cross_kv_int8=True, self_kv_int8=True)
    agreement = (np.asarray(a) == np.asarray(b)).mean()
    assert agreement > 0.85, agreement


def test_beam_segmented_matches_unsegmented(setup):
    """segment>0 bounds the reorder gather + self-attention window per
    static segment; tokens must be bit-identical to one unsegmented loop."""
    cfg, params, enc, prompt = setup
    ref = beam_decode(params, enc, cfg, prompt, num_beams=3,
                      max_new_tokens=12, segment=0)
    for seg in (2, 4, 7):
        out = beam_decode(params, enc, cfg, prompt, num_beams=3,
                          max_new_tokens=12, segment=seg)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out),
                                      err_msg=f"segment={seg}")


def test_beam_segmented_int8_matches(setup):
    cfg, params, enc, prompt = setup
    ref = beam_decode(params, enc, cfg, prompt, num_beams=2, max_new_tokens=10,
                      cross_kv_int8=True, self_kv_int8=True, segment=0)
    out = beam_decode(params, enc, cfg, prompt, num_beams=2, max_new_tokens=10,
                      cross_kv_int8=True, self_kv_int8=True, segment=3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_beam_scores_int8_head_minor_token_agreement(setup):
    """Head-minor beams (the fused-kernel cache layout; jnp twin off-TPU)
    must token-agree with the classic-layout s8 einsum beams — the two
    quantization pipelines compute the same math in different layouts."""
    cfg, params, enc, prompt = setup
    kw = dict(num_beams=3, max_new_tokens=8, cross_kv_int8=True,
              self_kv_int8=True, scores_int8=True)
    classic = beam_decode(params, enc, cfg, prompt, head_minor=False, **kw)
    hm = beam_decode(params, enc, cfg, prompt, head_minor=True, **kw)
    np.testing.assert_array_equal(np.asarray(classic), np.asarray(hm))
