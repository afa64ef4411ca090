#!/usr/bin/env python
"""Benchmark CLI: RTFx sweeps across model / batch / precision / decoder.

The reference has no benchmark tooling at all (SURVEY.md §6: quality
baselines only, latency was a "planned metric"). `bench.py` is the driver's
one-line headline; this CLI is the engineer's tool: sweeps with a table and
JSON output, on real hardware.
"""

import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("benchmark")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="RTFx benchmark sweeps (TPU)")
    p.add_argument("--model", type=str, default="whisper-small")
    p.add_argument("--batch_sizes", type=int, nargs="+", default=[32, 128])
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--kv_cache", type=str, nargs="+", default=["int8"],
                   choices=["int8", "bf16", "int4"])
    p.add_argument("--kv_layout", type=str, default="auto",
                   choices=["auto", "classic"],
                   help="Cross-KV cache layout: auto = whisper.use_head_minor "
                        "(head-minor slabs feeding the fused streaming decode "
                        "kernels on TPU), classic = force the [L,B,H,S,hd] "
                        "einsum layout (the pre-round-4 default; used to "
                        "validate the fused path per model size)")
    p.add_argument("--attn_scores", type=str, default="bf16",
                   choices=["bf16", "int8"],
                   help="int8 runs BOTH attention matmuls on the int8 MXU "
                        "(~21%% faster/op, approximate: probs are quantized); "
                        "requires int8 KV; reports token agreement vs bf16")
    p.add_argument("--num_beams", type=int, nargs="+", default=[1],
                   help="Beam widths to sweep (1 = greedy); beam rows report "
                        "the per-token cost of the cache-reordering search")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--platform", type=str, default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="Pin the jax platform (cpu + "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                        "gives an N-device virtual mesh)")
    p.add_argument("--dp", type=int, default=1,
                   help="Data-parallel mesh axis (batch shards over it)")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel mesh axis (ICI-sharded model)")
    p.add_argument("--dcn_dp", type=int, default=1,
                   help="Data-parallel replicas over DCN (multi-slice/multi-host)")
    p.add_argument("--streaming", action="store_true",
                   help="Benchmark incremental (streaming) transcription: "
                        "per-update latency + real-time factor at batch 1")
    p.add_argument("--streaming_chunk_seconds", type=float, default=1.0,
                   help="Audio fed per streaming update")
    p.add_argument("--train", action="store_true",
                   help="Benchmark the LoRA train step (forward + backward + "
                        "AdamW, gradient accumulation) in examples/sec — the "
                        "reference's Phase-1 workload "
                        "(/root/reference/src/training/trainer.py:203-312)")
    p.add_argument("--train_accum", type=int, default=4,
                   help="Gradient accumulation microbatches per step")
    p.add_argument("--train_label_len", type=int, default=224,
                   help="Label length per example (448 max positions)")
    p.add_argument("--train_lora_rank", type=int, default=16)
    p.add_argument("--train_remat", type=str, default="on",
                   choices=["on", "off"],
                   help="Gradient checkpointing in the train step (off = "
                        "hold all activations; used to measure the remat "
                        "OOM wall per model width)")
    p.add_argument("--routed", action="store_true",
                   help="Benchmark Phase-2 routed inference end-to-end: ONE "
                        "compiled LID->bank-gather->decode pass per "
                        "mixed-language batch vs oracle-language decode. "
                        "Reports routing overhead per utterance (the "
                        "reference's own target is <10 ms/utt, "
                        "PROJECT_REQUIREMENTS.md:999-1004) and routed vs "
                        "oracle RTFx")
    p.add_argument("--routed_languages", type=int, default=4,
                   help="Adapters in the routed bank (the reference's "
                        "Phase-2 setup routes 4 languages)")
    p.add_argument("--routed_lid_layer", type=int, default=-1,
                   help="Encoder layer tapped for LID features (-1 = final "
                        "post-LN output, the reference default; k>=0 runs "
                        "only the first k+1 layers — cheaper LID)")
    p.add_argument("--routed_lora_rank", type=int, default=16)
    p.add_argument("--serving", action="store_true",
                   help="Benchmark the micro-batching serving layer at "
                        "saturation (concurrent clients, end-to-end "
                        "latency incl. queueing)")
    p.add_argument("--serving_requests", type=int, default=128,
                   help="Concurrent requests per serving row")
    p.add_argument("--serving_wait_ms", type=float, default=20.0,
                   help="Service batching window")
    p.add_argument("--no_agreement", action="store_true",
                   help="Skip the token-agreement comparison decode on "
                        "approximate rows (--attn_scores int8 / --kv_cache "
                        "int4). Use for capacity probes where the exact-path "
                        "comparison itself exceeds HBM (e.g. whisper-large "
                        "B>=48: the int8-KV reference decode thrashes or "
                        "crashes while the int4 candidate fits)")
    p.add_argument("--output", type=str, default=None)
    return p.parse_args(argv)


def run_streaming(cfg, params, chunk_seconds, iters, kv_int8,
                  max_new_tokens):
    """Per-update latency of StreamingTranscriber (batch 1). A streaming
    system is real-time iff latency < chunk_seconds (rtf > 1): every update
    re-encodes the window and replays the committed transcript through ONE
    pre-compiled decode program (traced prompt_len, no retracing)."""
    import numpy as np
    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.evaluation.streaming import StreamingTranscriber
    from sar_tpu.ops import mel as mel_ops

    st = StreamingTranscriber(cfg, params, CharTokenizer(cfg),
                              language="hindi",
                              max_new_tokens=max_new_tokens,
                              kv_int8=kv_int8)
    rng = np.random.default_rng(0)
    chunk_n = int(chunk_seconds * mel_ops.SAMPLE_RATE)
    updates = max(1, st.window_samples // chunk_n)

    def chunk():
        return (rng.standard_normal(chunk_n) * 0.1).astype(np.float32)

    st.feed(chunk())                        # compile + warm
    lats = []
    for _ in range(iters):
        st.reset()
        for _ in range(updates):
            t0 = time.perf_counter()
            st.feed(chunk())
            lats.append(time.perf_counter() - t0)
    lats = sorted(lats)
    mean = sum(lats) / len(lats)
    p90 = lats[int(0.9 * (len(lats) - 1))]
    return {"mode": "streaming", "chunk_seconds": chunk_seconds,
            "updates_per_window": updates,
            "ms_per_update_mean": round(mean * 1000, 2),
            "ms_per_update_p90": round(p90 * 1000, 2),
            "streaming_rtf": round(chunk_seconds / mean, 2),
            "kv": "int8" if kv_int8 else "bf16"}


def run_serving(cfg, params, batch, max_new_tokens, n_requests,
                max_wait_ms):
    """Saturation throughput/latency of the micro-batching serving layer:
    n_requests concurrent clients push one window-length clip each through
    TranscriptionService; reported latency includes queueing (the honest
    end-to-end number a client sees at saturation)."""
    import threading

    import numpy as np

    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.serving import TranscriptionService

    window_s = cfg.num_audio_frames / 100.0        # mel hop = 10 ms
    rng = np.random.default_rng(0)
    clips = [(rng.standard_normal(int(window_s * 16000)) * 0.1)
             .astype(np.float32) for _ in range(8)]
    svc = TranscriptionService(cfg, params, CharTokenizer(cfg),
                               language="hindi", batch_size=batch,
                               max_wait_ms=max_wait_ms,
                               max_new_tokens=max_new_tokens)
    try:
        t0 = time.perf_counter()
        svc.transcribe(clips[0], timeout=1800)     # compile both programs
        compile_s = time.perf_counter() - t0
        results = [None] * n_requests

        def run(i):
            results[i] = svc.transcribe(clips[i % len(clips)], timeout=1800)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(n_requests)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        st = svc.stats()
    finally:
        svc.close()
    assert all(isinstance(r, str) for r in results)
    return {"mode": "serving", "batch": batch, "requests": n_requests,
            "wall_s": round(dt, 2),
            "requests_per_s": round(n_requests / dt, 2),
            "audio_sec_per_s": round(n_requests * window_s / dt, 1),
            "batches": st["batches"] - 1,          # minus warmup
            "latency_ms_p50": st.get("latency_ms_p50"),
            "latency_ms_p95": st.get("latency_ms_p95"),
            "compile_s": round(compile_s, 1)}


def run_routed(cfg, params, batch, max_new_tokens, iters, kv, n_languages,
               lid_layer, lora_rank):
    """Phase-2 routed inference, end-to-end on device: mel -> LID features ->
    classifier -> adapter-index gather -> banked encode -> greedy decode, ONE
    compiled program per batch (models/router.py:129-151 is the production
    path; the reference loops per-sample HF generates,
    /root/reference/src/models/adapter_router.py:715-761).

    Measured against the ORACLE program (same banked decode, adapter index
    given) so the routing overhead — the LID encoder pass + classifier +
    prompt/bank gathers — is isolated per utterance. The reference's own
    Phase-2 success metric is routing overhead < 10 ms/utterance
    (/root/reference/PROJECT_REQUIREMENTS.md:999-1004). Weights are random:
    throughput is weight-independent, and the index gather's cost is
    identical whatever the classifier predicts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sar_tpu.decode.greedy import greedy_decode
    from sar_tpu.models import classifier as clf
    from sar_tpu.models import lora as lora_lib
    from sar_tpu.models import whisper
    from sar_tpu.ops import mel as mel_ops

    langs = ["hindi", "italian", "punjabi", "telugu",
             "german", "french", "spanish", "english"][:n_languages]
    lcfg = lora_lib.LoraConfig(r=lora_rank, alpha=2 * lora_rank)
    bank = lora_lib.stack_adapters(
        [lora_lib.init_lora(jax.random.PRNGKey(i), cfg, lcfg)
         for i in range(n_languages)])
    ccfg = clf.ClassifierConfig(input_dim=cfg.d_model, dropout=0.0,
                                num_classes=n_languages,
                                languages=tuple(langs),
                                encoder_layer=lid_layer)
    clf_params = clf.init_classifier(jax.random.PRNGKey(42), ccfg)
    prompts = jnp.asarray([cfg.prompt_ids(l) for l in langs], jnp.int32)

    kv_int8, kv_int4 = kv == "int8", kv == "int4"
    flash = "hm" if jax.default_backend() == "tpu" else False
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, mel_ops.N_SAMPLES)) * 0.1,
                        jnp.float32)

    def mel_feats(params, audio):
        feats = mel_ops.log_mel_spectrogram(audio, cfg.num_mel_bins,
                                            dtype=jnp.bfloat16)
        return feats[:, :, :cfg.num_audio_frames]

    def detect(params, clf_params, feats):
        hid = clf.encode_features(params, feats, cfg, layer_index=lid_layer,
                                  flash=flash)
        idx, _ = clf.predict(clf_params, ccfg, hid)
        return idx.astype(jnp.int32)

    def banked_decode(params, bank, feats, idx):
        enc = whisper.encode(params, feats, cfg, lora=bank, adapter_idx=idx,
                             lora_scale=lcfg.scale, flash=flash)
        return greedy_decode(params, enc, cfg, prompts[idx],
                             max_new_tokens=max_new_tokens, lora=bank,
                             adapter_idx=idx, lora_scale=lcfg.scale,
                             cross_kv_int8=kv_int8, self_kv_int8=kv_int8,
                             cross_kv_int4=kv_int4, self_kv_int4=kv_int4)

    @jax.jit
    def lid_only(params, clf_params, audio):
        return detect(params, clf_params, mel_feats(params, audio))

    @jax.jit
    def routed(params, clf_params, bank, audio):
        feats = mel_feats(params, audio)
        idx = detect(params, clf_params, feats)
        return banked_decode(params, bank, feats, idx), idx

    @jax.jit
    def oracle(params, bank, audio, idx):
        return banked_decode(params, bank, mel_feats(params, audio), idx)

    # AOT executables: fixed programs are what a benchmark should time (and
    # they bypass the jax-0.9 cpp-pjit buffer-recount issue, cf. run_config).
    lid_c = lid_only.lower(params, clf_params, audio).compile()
    routed_c = routed.lower(params, clf_params, bank, audio).compile()
    toks_routed, idx0 = routed_c(params, clf_params, bank, audio)
    idx0 = jnp.asarray(np.asarray(idx0))            # oracle gets the answer
    oracle_c = oracle.lower(params, bank, audio, idx0).compile()
    toks_oracle = oracle_c(params, bank, audio, idx0)
    # Sanity: routing must cost time, never tokens — same idx, same decode.
    agreement = float((np.asarray(toks_routed) == np.asarray(toks_oracle))
                      .mean())

    def timed(fn, *a):
        np.asarray(jax.tree.leaves(fn(*a))[0])      # warm + fence
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    t_routed = timed(routed_c, params, clf_params, bank, audio)
    t_oracle = timed(oracle_c, params, bank, audio, idx0)
    t_lid = timed(lid_c, params, clf_params, audio)

    return {"mode": "routed", "batch": batch, "kv": kv,
            "languages": len(langs), "lid_layer": lid_layer,
            "lora_rank": lora_rank,
            "routed_s_per_batch": round(t_routed, 4),
            "oracle_s_per_batch": round(t_oracle, 4),
            "rtfx_routed": round(batch * mel_ops.CHUNK_SECONDS / t_routed, 1),
            "rtfx_oracle": round(batch * mel_ops.CHUNK_SECONDS / t_oracle, 1),
            "routing_overhead_ms_per_utt":
                round((t_routed - t_oracle) * 1000 / batch, 3),
            "lid_ms_per_utt": round(t_lid * 1000 / batch, 3),
            "token_agreement_vs_oracle": round(agreement, 4)}


def run_train(cfg, params, batch, accum, label_len, lora_rank, iters,
              mesh=None, remat=True):
    """Steady-state LoRA train-step throughput: one donated jitted program
    per step (accum microbatches scanned inside, AdamW + clip + schedule).
    Weight values don't affect step time, so random init measures the same
    program a real run executes. Mirrors the measured-by-hand round-2
    numbers (PARITY.md: whisper-small B=16 x accum 4 = 37.3 ex/s)."""
    import jax
    import numpy as np

    from sar_tpu.models import lora as lora_lib
    from sar_tpu.training.trainer import ASRTrainer, TrainingArgs

    lcfg = lora_lib.LoraConfig(r=lora_rank, alpha=2 * lora_rank)
    bank = lora_lib.init_lora(jax.random.PRNGKey(0), cfg, lcfg)
    targs = TrainingArgs(gradient_accumulation_steps=accum,
                         gradient_checkpointing=remat)
    trainer = ASRTrainer(cfg, params, bank, lcfg, targs, mesh=mesh)

    rng = np.random.default_rng(0)
    mels = trainer._put(rng.standard_normal(
        (accum, batch, cfg.num_mel_bins, cfg.num_audio_frames))
        .astype(np.float32), 1)
    labels = trainer._put(rng.integers(
        0, cfg.vocab_size, (accum, batch, label_len)).astype(np.int32), 1)
    ids = trainer._put(np.zeros((accum, batch), np.int32), 1)

    def step(lora, opt_state):
        trainer._rng, k = jax.random.split(trainer._rng)
        return trainer._train_step(lora, opt_state, trainer.base_params,
                                   mels, labels, ids, k)

    # Warm/compile (the step donates lora/opt_state; rebind every call).
    # Completion is fenced with a device->host transfer of the loss:
    # block_until_ready alone does NOT guarantee completion through
    # remote-execution (axon) tunnels and times the dispatch, not the step.
    lora, opt_state, loss, _ = step(trainer.lora, trainer.opt_state)
    np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        lora, opt_state, loss, _ = step(lora, opt_state)
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / iters
    return {"mode": "train", "batch": batch, "accum": accum,
            "label_len": label_len, "lora_rank": lora_rank, "remat": remat,
            "s_per_step": round(dt, 4),
            "examples_per_s": round(accum * batch / dt, 2)}


def run_config(cfg, params, batch, max_new_tokens, kv, iters, mesh=None,
               scores_int8=False, num_beams=1, agreement=True,
               layout="auto"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sar_tpu.decode.beam import beam_decode
    from sar_tpu.decode.greedy import greedy_decode_from_cache
    from sar_tpu.models import whisper
    from sar_tpu.ops import mel as mel_ops

    if scores_int8 and mesh is not None:
        # Same guard as ASREvaluator: the fused s8 kernel has no SPMD rule.
        print("warning: --attn_scores int8 is unsupported under a mesh; "
              "using bf16 scores", file=sys.stderr)
        scores_int8 = False
    kv_int8, kv_int4 = kv == "int8", kv == "int4"
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)
    total = min(len(cfg.prompt_ids("hindi")) + max_new_tokens,
                cfg.max_target_positions)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, mel_ops.N_SAMPLES)) * 0.1,
                        jnp.float32)
    if mesh is not None:
        # Shard over ALL batch axes ("replica" + "data"): P("data", None)
        # alone would duplicate compute per replica on a --dcn_dp mesh and
        # overreport multi-slice RTFx.
        from sar_tpu.parallel.distributed import put_global_batch
        audio = put_global_batch(np.asarray(audio), mesh)

    flash = "hm" if jax.default_backend() == "tpu" else False

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def prep(params, audio, head_minor):
        feats = mel_ops.log_mel_spectrogram(audio, cfg.num_mel_bins,
                                            dtype=jnp.bfloat16)
        feats = feats[:, :, :cfg.num_audio_frames]
        enc = whisper.encode(params, feats, cfg, flash=flash)
        return whisper.init_cache(params, enc, cfg, max_len=total,
                                  cross_kv_int8=kv_int8, self_kv_int8=kv_int8,
                                  cross_kv_int4=kv_int4, self_kv_int4=kv_int4,
                                  head_minor=head_minor)

    @jax.jit
    def prep_enc(params, audio):
        feats = mel_ops.log_mel_spectrogram(audio, cfg.num_mel_bins,
                                            dtype=jnp.bfloat16)
        feats = feats[:, :, :cfg.num_audio_frames]
        return whisper.encode(params, feats, cfg, flash=flash)

    # `prompt` is passed as an ARGUMENT to the jitted decoders, not closed
    # over: a jnp array in a closure cell becomes a hoisted constant buffer,
    # and jax 0.9's cpp-pjit fast path can then fail a repeat execution with
    # "supplied 30 buffers but compiled program expected 31" when other
    # jitted programs ran earlier in the process (e.g. an ASREvaluator).
    @partial(jax.jit, donate_argnums=(1,), static_argnums=(3,))
    def dec_with_cache(params, cache, prompt, s_int8):
        # return_cache -> the donated cache aliases the loop carry.
        return greedy_decode_from_cache(params, cache, cfg, prompt,
                                        scores_int8=s_int8, return_cache=True)

    def dec(params, cache, s_int8):
        tokens, spent = dec_with_cache(params, cache, prompt, s_int8)
        del spent
        return tokens

    # classic forces the pre-round-4 einsum layout; None defers to the
    # decoder's own auto (use_head_minor / the s8 opt-in).
    beam_hm = False if (layout == "classic" or mesh is not None) else None
    hm = False  # set by the greedy branch below

    @jax.jit
    def dec_beam(params, enc, prompt):
        return beam_decode(params, enc, cfg, prompt, num_beams=num_beams,
                           max_new_tokens=max_new_tokens,
                           cross_kv_int8=kv_int8, self_kv_int8=kv_int8,
                           cross_kv_int4=kv_int4, self_kv_int4=kv_int4,
                           scores_int8=scores_int8, head_minor=beam_hm)

    # The timed callables are AOT-compiled (lower().compile()): jax 0.9's
    # cpp-pjit fast path miscounts kept argument buffers for the beam
    # program on repeat calls when other jitted programs ran earlier in the
    # process ("Execution supplied 30 buffers but compiled program expected
    # 31") — AOT executables bypass that path, and fixed executables are
    # what a benchmark should time anyway.
    if num_beams > 1:
        prep_enc_c = prep_enc.lower(params, audio).compile()
        enc0 = prep_enc_c(params, audio)
        dec_beam_c = dec_beam.lower(params, enc0, prompt).compile()

        def run():
            enc = prep_enc_c(params, audio)
            return dec_beam_c(params, enc, prompt)
    else:
        # Head-minor cache feeds the fused streaming kernels (exact default
        # on TPU; s8-MXU under scores_int8).
        hm = layout != "classic" and whisper.use_head_minor(
            cross_kv_int8=kv_int8, self_kv_int8=kv_int8,
            cross_kv_int4=kv_int4, self_kv_int4=kv_int4,
            scores_int8=scores_int8, mesh=mesh)
        prep_c = prep.lower(params, audio, hm).compile()
        cache0 = prep_c(params, audio)
        dec_c = dec_with_cache.lower(params, cache0, prompt,
                                     scores_int8).compile()
        del cache0

        def run():
            tokens, spent = dec_c(params, prep_c(params, audio), prompt)
            del spent
            return tokens

    np.asarray(run())                       # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    row = {"batch": batch, "kv": kv,
           "attn_scores": "int8" if scores_int8 else "bf16",
           "layout": ("head_minor" if num_beams == 1 and hm else
                      "auto" if num_beams > 1 and beam_hm is None else
                      "classic"),
           "num_beams": num_beams,
           "seconds_per_batch": round(dt, 4),
           "rtfx": round(batch * mel_ops.CHUNK_SECONDS / dt, 1),
           "ms_per_token": round(dt / max_new_tokens * 1000, 3)}
    if scores_int8 and num_beams == 1 and agreement:
        # The gating harness: int8-MXU scores are an approximation (probs
        # quantization); record token agreement vs the exact bf16-scores
        # decode (classic cache layout).
        # `out` from the timed loop already is the s8 decode; only the
        # exact bf16 reference needs to run.
        a = np.asarray(out)
        b = np.asarray(dec(params, prep(params, audio, False), False))
        row["token_agreement_vs_bf16"] = round(float((a == b).mean()), 4)
    if (num_beams == 1 and agreement and not scores_int8 and kv_int8
            and hm):
        # Exact-kernel promotion evidence: the fused streaming kernel is
        # bit-compatible math with the classic einsum path (same
        # quantization points), but float reduction order differs — record
        # token agreement vs the classic-layout decode per model size.
        a = np.asarray(out)
        b = np.asarray(dec(params, prep(params, audio, False), False))
        row["token_agreement_vs_classic"] = round(float((a == b).mean()), 4)
    if kv_int4 and num_beams == 1 and agreement:
        # int4 is coarser (15 levels/row vs int8's 255): record token
        # agreement vs the default int8-KV decode so the quantization cost
        # is visible next to the traffic win (promotion evidence, like the
        # scores_int8 harness above).
        @jax.jit
        def prep8(params, audio):
            feats = mel_ops.log_mel_spectrogram(audio, cfg.num_mel_bins,
                                                dtype=jnp.bfloat16)
            feats = feats[:, :, :cfg.num_audio_frames]
            enc = whisper.encode(params, feats, cfg, flash=flash)
            return whisper.init_cache(params, enc, cfg, max_len=total,
                                      cross_kv_int8=True, self_kv_int8=True)
        # The timed loop's `out` IS the int4 decode — reuse it instead of
        # re-running a full candidate decode; only the int8 reference runs.
        a = np.asarray(out)
        b = np.asarray(dec(params, prep8(params, audio), False))
        row["token_agreement_vs_int8"] = round(float((a == b).mean()), 4)
    return row


def main(argv=None):
    args = parse_args(argv)
    import jax
    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from sar_tpu.models import whisper
    from sar_tpu.models.base import load_base_model
    from sar_tpu.models.config import get_config

    try:
        cfg, params = load_base_model(args.model, dtype=jnp.bfloat16)
    except Exception as e:
        # RTFx is weight-independent; offline environments use random init.
        logger.warning("no pretrained weights available (%s); using random "
                       "init — throughput numbers are unaffected", e)
        cfg = get_config(args.model)
        params = whisper.cast_params(
            whisper.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    from sar_tpu.parallel.distributed import maybe_initialize_distributed
    from sar_tpu.parallel.sharding import mesh_from_flags, shard_params
    maybe_initialize_distributed()
    mesh = mesh_from_flags(args.dp, args.tp, args.dcn_dp)
    if mesh is not None:
        params = shard_params(params, mesh)
        logger.info("benchmarking on mesh %s", mesh)
    rows = []
    if args.train:
        for b in args.batch_sizes:
            r = run_train(cfg, params, b, args.train_accum,
                          args.train_label_len, args.train_lora_rank,
                          args.iters, mesh=mesh,
                          remat=args.train_remat == "on")
            rows.append(r)
            print(f"train batch={b} x accum={r['accum']}: "
                  f"{r['s_per_step']} s/step = {r['examples_per_s']} ex/s "
                  f"(labels {r['label_len']}, r{r['lora_rank']})")
        report = {"model": args.model, "results": rows}
        if args.output:
            Path(args.output).write_text(json.dumps(report, indent=2))
        return report
    if args.routed:
        if mesh is not None:
            logger.warning("--routed benchmarks the single-chip routed "
                           "program; ignoring the mesh flags")
        for b in args.batch_sizes:
            r = run_routed(cfg, params, b, args.max_new_tokens, args.iters,
                           args.kv_cache[0], args.routed_languages,
                           args.routed_lid_layer, args.routed_lora_rank)
            rows.append(r)
            print(f"routed batch={b} ({r['languages']} langs, LID layer "
                  f"{r['lid_layer']}): {r['rtfx_routed']} RTFx vs oracle "
                  f"{r['rtfx_oracle']} — overhead "
                  f"{r['routing_overhead_ms_per_utt']} ms/utt (LID alone "
                  f"{r['lid_ms_per_utt']} ms/utt), token agreement "
                  f"{r['token_agreement_vs_oracle']}")
        report = {"model": args.model, "max_new_tokens": args.max_new_tokens,
                  "results": rows}
        if args.output:
            Path(args.output).write_text(json.dumps(report, indent=2))
        return report
    if args.serving:
        for b in args.batch_sizes:
            r = run_serving(cfg, params, b, args.max_new_tokens,
                            args.serving_requests, args.serving_wait_ms)
            rows.append(r)
            print(f"serving batch={b}: {r['requests_per_s']} req/s "
                  f"({r['audio_sec_per_s']} audio-sec/s), p50 "
                  f"{r['latency_ms_p50']} ms, p95 {r['latency_ms_p95']} ms "
                  f"({r['batches']} batches)")
        report = {"model": args.model, "max_new_tokens": args.max_new_tokens,
                  "results": rows}
        if args.output:
            Path(args.output).write_text(json.dumps(report, indent=2))
        return report
    if args.streaming:
        for kv in args.kv_cache:
            r = run_streaming(cfg, params, args.streaming_chunk_seconds,
                              args.iters, kv == "int8", args.max_new_tokens)
            rows.append(r)
            print(f"streaming kv={r['kv']}: {r['ms_per_update_mean']} ms/update "
                  f"(p90 {r['ms_per_update_p90']}), rtf {r['streaming_rtf']}x "
                  f"({r['updates_per_window']} updates/window)")
        report = {"model": args.model, "max_new_tokens": args.max_new_tokens,
                  "results": rows}
        if args.output:
            Path(args.output).write_text(json.dumps(report, indent=2))
        return report
    print(f"{'batch':>6} {'kv':>5} {'scores':>7} {'beams':>6} {'s/batch':>9} "
          f"{'RTFx':>8} {'ms/tok':>8} {'agree':>7}")
    for kv in args.kv_cache:
        if args.attn_scores == "int8" and kv != "int8":
            logger.warning("--attn_scores int8 requires int8 KV; skipping "
                           "kv=%s rows", kv)
            continue
        for nb in args.num_beams:
            for b in args.batch_sizes:
                try:
                    r = run_config(cfg, params, b, args.max_new_tokens,
                                   kv, args.iters, mesh=mesh,
                                   scores_int8=args.attn_scores == "int8",
                                   num_beams=nb,
                                   agreement=not args.no_agreement,
                                   layout=args.kv_layout)
                except Exception as e:
                    logger.warning("config batch=%d kv=%s beams=%d failed: %s",
                                   b, kv, nb, e)
                    continue
                rows.append(r)
                print(f"{r['batch']:>6} {r['kv']:>5} {r['attn_scores']:>7} "
                      f"{r['num_beams']:>6} {r['seconds_per_batch']:>9} "
                      f"{r['rtfx']:>8} {r['ms_per_token']:>8} "
                      f"{r.get('token_agreement_vs_bf16', r.get('token_agreement_vs_int8', '-')):>7}")
    report = {"model": args.model, "max_new_tokens": args.max_new_tokens,
              "results": rows}
    if args.output:
        Path(args.output).write_text(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
