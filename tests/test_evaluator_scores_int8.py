"""ASREvaluator(scores_int8=True): the s8-MXU attention opt-in through the
evaluation stack (jnp twins on CPU) — the path evaluate_model.py
--attn_scores int8 uses for real-weight WER gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.data.tokenizer import CharTokenizer
from sar_tpu.evaluation.evaluator import ASREvaluator
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params, CharTokenizer(cfg)


def _mel(cfg, rng):
    return jnp.asarray(rng.standard_normal((4, cfg.num_mel_bins,
                                            cfg.max_source_positions * 2)),
                       jnp.float32)


def test_greedy_scores_int8_high_agreement(setup, rng):
    cfg, params, tok = setup
    mel = _mel(cfg, rng)
    exact = ASREvaluator(cfg, params, tok, language="english",
                         max_new_tokens=8)._transcribe_batch(mel)
    s8 = ASREvaluator(cfg, params, tok, language="english", max_new_tokens=8,
                      scores_int8=True)._transcribe_batch(mel)
    assert len(s8) == len(exact) == 4
    # Approximate path: most rows should still agree on random weights.
    agree = sum(a == b for a, b in zip(s8, exact))
    assert agree >= 2, (s8, exact)


def test_beam_scores_int8_runs(setup, rng):
    cfg, params, tok = setup
    mel = _mel(cfg, rng)
    out = ASREvaluator(cfg, params, tok, language="english",
                       max_new_tokens=6, num_beams=2,
                       scores_int8=True)._transcribe_batch(mel)
    assert len(out) == 4 and all(isinstance(t, str) for t in out)


def test_scores_int8_requires_int8_kv(setup):
    cfg, params, tok = setup
    with pytest.raises(ValueError, match="kv_int8"):
        ASREvaluator(cfg, params, tok, kv_int8=False, scores_int8=True)
