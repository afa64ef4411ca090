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


def test_beam_scores_int8_stays_on(setup, rng):
    """Beams + scores_int8 ride the beam-folded fused kernel on TPU
    (hardware-validated: jobs/tpu_validation.sh step 4, token agreement
    1.0 on v5e); the evaluator keeps the flag ON under beams. On CPU this
    exercises beam_decode's jnp twin of the same s8 math."""
    cfg, params, tok = setup
    mel = _mel(cfg, rng)
    ev = ASREvaluator(cfg, params, tok, language="english",
                      max_new_tokens=6, num_beams=2, scores_int8=True)
    assert ev.scores_int8 is True
    assert ev.kv_int8 is True
    out = ev._transcribe_batch(mel)
    assert len(out) == 4 and all(isinstance(t, str) for t in out)
    # Matches a direct beam_decode(scores_int8=True) over the same batch
    # (the s8 path is approximate, so the reference is ITSELF, not bf16).
    from sar_tpu.decode.beam import beam_decode
    from sar_tpu.decode.greedy import transcribe_tokens
    from sar_tpu.models import whisper
    import jax.numpy as jnp
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    enc = whisper.encode(params, mel, cfg)
    tokens = beam_decode(params, enc, cfg, prompt, num_beams=2,
                         max_new_tokens=6, cross_kv_int8=True,
                         self_kv_int8=True, scores_int8=True)
    ids = transcribe_tokens(tokens, cfg, prompt_len=int(prompt.shape[0]))
    assert out == [tok.decode(r) for r in ids]


def test_mesh_scores_int8_falls_back(setup, rng, caplog):
    """The fused s8 kernel has no SPMD partitioning rule; under a mesh the
    evaluator reverts to bf16 scores instead of erroring/all-gathering."""
    import logging
    from sar_tpu.parallel.sharding import make_mesh
    cfg, params, tok = setup
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    with caplog.at_level(logging.WARNING):
        ev = ASREvaluator(cfg, params, tok, language="english",
                          max_new_tokens=6, mesh=mesh, scores_int8=True)
    assert ev.scores_int8 is False
    assert any("mesh" in r.message for r in caplog.records)
    out = ev._transcribe_batch(_mel(cfg, rng))
    assert len(out) == 4


def test_scores_int8_requires_int8_kv(setup):
    cfg, params, tok = setup
    with pytest.raises(ValueError, match="kv_int8"):
        ASREvaluator(cfg, params, tok, kv_int8=False, scores_int8=True)


def test_s8_gate_harness(tmp_path):
    """The promotion-gate harness (scripts/s8_gate.py) runs hermetically:
    agreement matrix over both greedy drivers + logit-delta probe, JSON
    verdict. On TPU the same harness exercises the fused kernel."""
    import json
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    try:
        import s8_gate
    finally:
        sys.path.pop(0)
    out = tmp_path / "gate.json"
    rc = s8_gate.main(["--models", "whisper-test", "--batches", "2",
                       "--max_new_tokens", "6", "--output", str(out)])
    report = json.loads(out.read_text())
    (cell,) = report["cells"]
    assert set(cell) >= {"agreement_twophase", "agreement_direct",
                         "max_logit_delta"}
    assert report["backend"] == "cpu" and report["fused_kernel"] is False
    assert rc in (0, 1)  # verdict, not a crash


def test_int4_gate_harness(tmp_path):
    """--quant int4 gates the nibble-packed int4 KV cache against the
    default int8 KV with the same agreement matrix + logit-delta probe
    (recorded decision: INT4_GATE.json)."""
    import json
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    try:
        import s8_gate
    finally:
        sys.path.pop(0)
    out = tmp_path / "gate.json"
    rc = s8_gate.main(["--quant", "int4", "--models", "whisper-test",
                       "--batches", "2", "--max_new_tokens", "6",
                       "--output", str(out)])
    report = json.loads(out.read_text())
    assert report["quant"] == "int4" and report["fused_kernel"] is False
    (cell,) = report["cells"]
    assert {"agreement_twophase", "agreement_direct", "max_logit_delta",
            "decode_s_int4", "decode_s_int8"} <= set(cell)
    assert rc in (0, 1)
