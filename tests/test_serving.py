"""Micro-batching serving layer + HTTP front.

The reference has no serving surface (SURVEY.md §2 stops at evaluation
scripts); parity target is the framework goal itself: concurrent requests
must coalesce into fixed-size compiled batches and return the SAME text
the offline pipeline produces."""

import io
import json
import sys
import threading
import urllib.error
import urllib.request
import wave
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from sar_tpu.models import whisper  # noqa: E402
from sar_tpu.models.config import get_config  # noqa: E402
from sar_tpu.serving import TranscriptionService  # noqa: E402


class _Tok:
    def decode(self, ids):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def world():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    clips = [rng.standard_normal(6000).astype(np.float32) * 0.1
             for _ in range(6)]
    return cfg, params, clips


@pytest.fixture(scope="module")
def reference_texts(world):
    from sar_tpu.evaluation.evaluator import batch_transcribe
    cfg, params, clips = world
    return batch_transcribe(clips, cfg, params, _Tok(), language="english",
                            batch_size=4, max_new_tokens=6)


def test_service_batches_and_matches_offline(world, reference_texts):
    cfg, params, clips = world
    with TranscriptionService(cfg, params, _Tok(), language="english",
                              batch_size=4, max_wait_ms=200.0,
                              max_new_tokens=6, flash=False) as svc:
        # Warm up (compile) so the batching window isn't eaten by compile.
        assert svc.transcribe(clips[0]) == reference_texts[0]
        results = [None] * len(clips)

        def run(i):
            results[i] = svc.transcribe(clips[i])

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(clips))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == reference_texts
        st = svc.stats()
    assert st["requests"] == len(clips) + 1
    assert st["rows_served"] == len(clips) + 1
    # 6 concurrent requests at batch 4 coalesce: strictly fewer batches
    # than requests (1 warmup + at most 4 more).
    assert st["batches"] <= 5
    assert st["latency_ms_p50"] > 0


def test_service_mixed_languages_match_single_runs(world):
    from sar_tpu.evaluation.evaluator import batch_transcribe
    cfg, params, clips = world
    want_en = batch_transcribe(clips[:1], cfg, params, _Tok(),
                               language="english", batch_size=2,
                               max_new_tokens=6)[0]
    want_de = batch_transcribe(clips[1:2], cfg, params, _Tok(),
                               language="german", batch_size=2,
                               max_new_tokens=6)[0]
    with TranscriptionService(cfg, params, _Tok(), language="english",
                              batch_size=2, max_wait_ms=500.0,
                              max_new_tokens=6, flash=False) as svc:
        svc.transcribe(clips[2])               # compile warmup
        out = [None, None]
        t1 = threading.Thread(
            target=lambda: out.__setitem__(0, svc.transcribe(
                clips[0], language="english")))
        t2 = threading.Thread(
            target=lambda: out.__setitem__(1, svc.transcribe(
                clips[1], language="german")))
        t1.start(), t2.start(), t1.join(), t2.join()
        st = svc.stats()
    # both rows rode one batch, each with its own language prompt
    assert st["batches"] == 2
    assert out == [want_en, want_de]


def test_service_routed_mode(world):
    from sar_tpu.models import classifier as clf
    from sar_tpu.models import lora as lora_lib
    from sar_tpu.models.router import AdapterRouter
    cfg, params, clips = world
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    banks = []
    for seed in (1, 3):
        b = lora_lib.init_lora(jax.random.PRNGKey(seed), cfg, lcfg)
        leaves, td = jax.tree.flatten(b)
        keys = jax.random.split(jax.random.PRNGKey(seed + 10), len(leaves))
        banks.append(jax.tree.unflatten(
            td, [jax.random.normal(k, l.shape) * 0.05
                 for k, l in zip(keys, leaves)]))
    bank = lora_lib.stack_adapters(banks)
    ccfg = clf.ClassifierConfig(input_dim=cfg.d_model, hidden_dims=(16,),
                                num_classes=2, dropout=0.0,
                                languages=("english", "german"))
    clf_params = clf.init_classifier(jax.random.PRNGKey(5), ccfg)
    router = AdapterRouter(cfg, params, bank, lcfg, clf_params, ccfg)

    from sar_tpu.decode.greedy import transcribe_tokens
    from sar_tpu.ops import mel as mel_ops
    audio = mel_ops.stack_pad_audio(clips[:2])
    feats = mel_ops.log_mel_spectrogram(jnp.asarray(audio), cfg.num_mel_bins)
    feats = feats[:, :, :cfg.num_audio_frames]
    want_tokens = router.generate(feats, max_new_tokens=6)
    want = [_Tok().decode(r) for r in transcribe_tokens(
        want_tokens, cfg, prompt_len=router.prompt_len)]

    # kv_int8=False so the program matches router.generate (bf16 KV)
    # bit-for-bit; the int8 path is covered by the decode suites.
    with TranscriptionService(router=router, tokenizer=_Tok(),
                              batch_size=2, max_wait_ms=300.0,
                              max_new_tokens=6, flash=False,
                              kv_int8=False) as svc:
        reqs = [svc.submit(c) for c in clips[:2]]
        got = [r.result(timeout=300.0) for r in reqs]
        detected = [r.detected for r in reqs]
    assert got == want
    assert all(d in ("english", "german") for d in detected)


def test_service_close_errors_pending():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    svc = TranscriptionService(cfg, params, _Tok(), language="english",
                               batch_size=2, max_new_tokens=6, flash=False)
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros(100, np.float32))


def _wav_bytes(audio):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_http_server_end_to_end(world, reference_texts):
    import serve as serve_mod
    cfg, params, clips = world
    svc = TranscriptionService(cfg, params, _Tok(), language="english",
                               batch_size=2, max_wait_ms=50.0,
                               max_new_tokens=6, flash=False)
    server = serve_mod.make_server(svc, "127.0.0.1", 0)
    host, port = server.server_address
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read()) == {"ok": True}
        req = urllib.request.Request(
            f"{base}/v1/transcribe?language=english",
            data=_wav_bytes(clips[0]), method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        # quantized through int16 wav: same pipeline, near-identical audio;
        # random weights can flip tokens, so assert shape not equality
        assert isinstance(out["text"], str)
        assert out["seconds"] == pytest.approx(len(clips[0]) / 16000, abs=0.01)
        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            st = json.loads(r.read())
        assert st["requests"] >= 1
        # malformed body -> 400
        bad = urllib.request.Request(f"{base}/v1/transcribe", data=b"nope",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
        assert ei.value.code == 404
    finally:
        server.shutdown()
        svc.close()


def test_wav_decode_resamples_and_mixes_down():
    import serve as serve_mod
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1
    stereo = np.stack([audio, audio], axis=1).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes((stereo * 32767).astype(np.int16).tobytes())
    out = serve_mod.wav_bytes_to_audio(buf.getvalue())
    assert out.ndim == 1
    # 8 kHz 1 s -> 16 kHz ~1 s
    assert abs(len(out) - 16000) < 50


def test_service_batch_failure_fans_out(world):
    cfg, params, clips = world
    svc = TranscriptionService(cfg, params, _Tok(), language="english",
                               batch_size=2, max_wait_ms=50.0,
                               max_new_tokens=6, flash=False)
    try:
        boom = RuntimeError("injected device failure")

        def bad_prep(params, mel):
            raise boom

        svc._prep = bad_prep
        with pytest.raises(RuntimeError, match="injected"):
            svc.transcribe(clips[0], timeout=60)
        assert svc.stats()["errors"] == 1
        # the worker survives a failed batch
        svc._prep = jax.jit(lambda p, m: None)  # never used: restore real
    finally:
        svc.close(drain=False)


def test_service_beam_mode_matches_offline(world):
    from sar_tpu.decode.beam import beam_decode
    from sar_tpu.decode.greedy import transcribe_tokens
    from sar_tpu.ops import mel as mel_ops
    cfg, params, clips = world
    audio = mel_ops.stack_pad_audio(clips[:2])
    feats = mel_ops.log_mel_spectrogram(jnp.asarray(audio), cfg.num_mel_bins)
    feats = feats[:, :, :cfg.num_audio_frames]
    enc = whisper.encode(params, feats, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("english"), jnp.int32)
    want_tokens = beam_decode(params, enc, cfg, prompt, num_beams=2,
                              max_new_tokens=6, cross_kv_int8=True,
                              self_kv_int8=True)
    want = [_Tok().decode(r) for r in transcribe_tokens(
        want_tokens, cfg, prompt_len=int(prompt.shape[0]))]
    with TranscriptionService(cfg, params, _Tok(), language="english",
                              batch_size=2, max_wait_ms=300.0,
                              max_new_tokens=6, num_beams=2,
                              flash=False) as svc:
        reqs = [svc.submit(c) for c in clips[:2]]
        got = [r.result(timeout=300.0) for r in reqs]
    assert got == want
    with pytest.raises(ValueError):
        TranscriptionService(router=object(), tokenizer=_Tok(), num_beams=2)


def test_submit_validation_protects_batch(world):
    cfg, params, clips = world
    svc = TranscriptionService(cfg, params, _Tok(), language="english",
                               batch_size=2, max_new_tokens=6, flash=False)
    try:
        with pytest.raises(ValueError, match="klingon"):
            svc.submit(clips[0], language="klingon")
        too_long = np.zeros(cfg.num_audio_frames * 160 + 1, np.float32)
        with pytest.raises(ValueError, match="longform"):
            svc.submit(too_long)
    finally:
        svc.close(drain=False)


def test_service_task_validation():
    with pytest.raises(ValueError):
        TranscriptionService(router=object(), tokenizer=_Tok(),
                             task="translate")


def test_service_precision_modes(world, reference_texts):
    """--kv_cache int4 and --attn_scores int8 build and serve (CPU: the
    jnp twins of both paths); int4/s8 are approximations, so only shape
    and type are asserted, plus the composition guards."""
    cfg, params, clips = world
    with TranscriptionService(cfg, params, _Tok(), language="english",
                              batch_size=2, max_wait_ms=50.0,
                              max_new_tokens=6, flash=False,
                              kv_int4=True) as svc:
        out = svc.transcribe(clips[0])
        assert isinstance(out, str) and out
    with TranscriptionService(cfg, params, _Tok(), language="english",
                              batch_size=2, max_wait_ms=50.0,
                              max_new_tokens=6, flash=False,
                              scores_int8=True) as svc:
        assert svc.scores_int8 is True
        out = svc.transcribe(clips[0])
        assert isinstance(out, str) and out
    with pytest.raises(ValueError, match="int4"):
        TranscriptionService(cfg, params, _Tok(), language="english",
                             kv_int4=True, scores_int8=True)
    with pytest.raises(ValueError, match="kv_int8"):
        TranscriptionService(cfg, params, _Tok(), language="english",
                             kv_int8=False, scores_int8=True)
