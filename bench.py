"""Headline benchmark: whisper-small greedy transcription RTFx on one chip.

Measures the full inference pipeline the reference runs per eval batch
(/root/reference/src/evaluation/__init__.py:64-95): log-mel frontend +
encoder + KV-cached greedy decode with max_new_tokens=256 — here compiled
end-to-end in JAX, mel computed on-device, decode as one lax.while_loop.

Weights are random (zero-egress environment): RTFx is independent of weight
values, and random weights never emit EOS, so every sequence decodes the full
256 tokens — a worst-case (lower-bound) RTFx; real transcriptions stop early
and run faster.

The reference publishes no speed numbers (BASELINE.md: quality only;
latency was a planned metric). `vs_baseline` therefore compares against an
ESTIMATED reference throughput of 50 audio-sec/sec for HF torch
whisper-small greedy (batch 16, fp16, A100, full 256-token generation) —
to be replaced by a fresh A100 measurement when one exists.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

REFERENCE_RTFX_A100_EST = 50.0
V5E_HBM_GBPS = 819.0     # v5e ("TPU v5 lite") HBM peak bandwidth
MODEL = os.environ.get("BENCH_MODEL", "whisper-small")
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
# BENCH_SCORES=int8 opts into the fused s8-MXU attention kernel
# (approximate: q/probs quantized; agreement 1.0 at these shapes on random
# weights — see scripts/benchmark.py's gating harness). Default stays the
# exact bf16-compute int8-KV path.
SCORES_INT8 = os.environ.get("BENCH_SCORES", "") == "int8"
# BENCH_KV=int4 opts into the nibble-packed int4 KV cache (quarter the
# bf16 traffic, coarser quantization — opt-in like scores_int8; the two
# do not compose). Default int8.
KV_INT4 = os.environ.get("BENCH_KV", "int8") == "int4"
if KV_INT4 and SCORES_INT8:
    raise SystemExit("BENCH_KV=int4 does not compose with BENCH_SCORES=int8")
# Decode-loop segmentation (static self-KV window growth); 0 = one loop.
SEGMENT = int(os.environ.get("BENCH_SEGMENT", "32"))
MAX_NEW_TOKENS = 256
# Per-iteration times are reported as median + spread: run-to-run HBM
# variance measured 5-7% on v5e, so a 3-iter mean hid round-over-round
# kernel gains inside the noise band (VERDICT r02).
ITERS = int(os.environ.get("BENCH_ITERS", "7"))


def decode_bytes_per_step(params, cache, total, kv_int8):
    """Estimated HBM bytes READ per decode step (the loop is memory-bound):
    full cross K/V (+ scales), the valid self-cache prefix (averaged over the
    loop: total/2), and every decoder weight incl. the logits embedding."""
    import jax
    from sar_tpu.models.whisper import param_count
    if cache.cross_k.ndim == 4:                           # head-minor layout
        L, B, S, D = cache.cross_k.shape
        H = cache.cross_k_scale.shape[2]
        hd = D // H
    else:
        # Under int4 the trailing axis is the PACKED hd//2 byte count, so
        # `hd * 1 byte` is already the true traffic; int8/bf16 unpacked.
        L, B, H, S, hd = cache.cross_k.shape
    kv_bytes = 1 if (kv_int8 or KV_INT4) else 2
    quant = kv_int8 or KV_INT4
    cross = 2 * L * B * H * S * hd * kv_bytes
    if quant:
        cross += 2 * L * B * H * S * 4                    # fp32 row scales
    self_hd = cache.self_k.shape[-1]
    self_sz = 2 * L * B * H * (total / 2) * self_hd * kv_bytes
    if quant:
        self_sz += 2 * L * B * H * (total / 2) * 4
    dec_params = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params["decoder"]))
    return cross + self_sz + dec_params


def _backend_watchdog(seconds: int):
    """Fail fast with a parseable JSON line if backend initialization
    hangs (a dead axon tunnel blocks jax.devices() indefinitely — measured
    in-session; an error record beats a wedged driver). A daemon THREAD,
    not SIGALRM: the hang sits inside a C call (PJRT client creation)
    that never returns to the bytecode loop, so a Python signal handler
    would be deferred forever. Returns a cancel callable."""
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(json.dumps({"metric": "rtfx", "value": 0.0,
                              "unit": "audio_s_per_s", "vs_baseline": 0.0,
                              "error": f"backend init exceeded {seconds}s "
                                       "(TPU tunnel down?)"}), flush=True)
            os._exit(1)

    threading.Thread(target=watch, daemon=True,
                     name="bench-init-watchdog").start()
    return done.set


def main():
    import jax
    import jax.numpy as jnp
    from sar_tpu.models import whisper
    from sar_tpu.models.config import get_config
    from sar_tpu.ops import mel as mel_ops

    cancel = _backend_watchdog(
        int(os.environ.get("BENCH_INIT_TIMEOUT", "900")))
    jax.devices()                  # force backend init under the watchdog
    cancel()

    cfg = get_config(MODEL)
    params = whisper.cast_params(
        whisper.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)

    total = min(len(cfg.prompt_ids("hindi")) + MAX_NEW_TOKENS,
                cfg.max_target_positions)

    # Two-phase (prep | decode loop) — fusing encode into the decode-loop
    # program slows the loop ~1.5x (see sar_tpu.decode.greedy docstring).
    # Blockwise (flash) encoder attention on TPU: no [1500, 1500] fp32 score
    # materialization (whisper-large B=32 OOMed on exactly that).
    # "hm" = head-minor fwd kernel (no transposes around the pallas call)
    flash = "hm" if jax.default_backend() == "tpu" else False

    @jax.jit
    def prep(params, audio):
        feats = mel_ops.log_mel_spectrogram(audio, cfg.num_mel_bins,
                                            dtype=jnp.bfloat16)
        enc = whisper.encode(params, feats, cfg, flash=flash)
        # int8 KV (cross + self): halves the dominant decode memory traffic;
        # 99.97% token agreement vs bf16 measured on random weights (worst
        # case for tie-breaking).
        # Head-minor slabs feed the fused streaming kernels: the exact
        # default decode kernel on TPU, the s8-MXU one under BENCH_SCORES.
        return whisper.init_cache(params, enc, cfg, max_len=total,
                                  cross_kv_int8=not KV_INT4,
                                  self_kv_int8=not KV_INT4,
                                  cross_kv_int4=KV_INT4,
                                  self_kv_int4=KV_INT4,
                                  head_minor=whisper.use_head_minor(
                                      cross_kv_int8=not KV_INT4,
                                      self_kv_int8=not KV_INT4,
                                      cross_kv_int4=KV_INT4,
                                      self_kv_int4=KV_INT4,
                                      scores_int8=SCORES_INT8))

    # The cache is donated to the decode loop: the prep output and the loop's
    # working cache never coexist in HBM (whisper-large B=32 used to OOM on
    # exactly that double allocation).
    from functools import partial
    from sar_tpu.decode.greedy import greedy_decode_from_cache

    @partial(jax.jit, donate_argnums=(1,))
    def decode(params, cache):
        # return_cache gives the donated cache a same-shaped output to alias
        # (XLA donation = input-output aliasing); callers drop it.
        return greedy_decode_from_cache(params, cache, cfg, prompt,
                                        scores_int8=SCORES_INT8,
                                        return_cache=True, segment=SEGMENT)

    def transcribe(params, audio):
        tokens, spent = decode(params, prep(params, audio))
        del spent
        return tokens

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, mel_ops.N_SAMPLES)) * 0.1, jnp.float32)

    # Warmup / compile. A device->host transfer (not just block_until_ready)
    # guarantees completion through remote-execution tunnels.
    cache0 = prep(params, audio)
    bytes_per_step = decode_bytes_per_step(params, cache0, total, kv_int8=True)
    tok0, spent0 = decode(params, cache0)
    np.asarray(tok0)
    del spent0

    # Prep alone (amortized once per batch; decode dominates). Each iteration
    # is fenced: async dispatch would otherwise allocate several multi-GB
    # caches at once (whisper-large B=32 cache is 5.8 GB — two in flight
    # plus params OOMed the 16 GB chip).
    prep_times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        c = jax.block_until_ready(prep(params, audio))
        prep_times.append(time.perf_counter() - t0)
        del c
    prep_s = float(np.median(prep_times))

    run_times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = jax.block_until_ready(transcribe(params, audio))
        run_times.append(time.perf_counter() - t0)
    np.asarray(out)

    # Median batch time -> RTFx; spread = (max-min)/median over the iters so
    # round-over-round deltas can be judged against the machine's own noise.
    batch_s = float(np.median(run_times))
    spread_pct = 100.0 * (max(run_times) - min(run_times)) / batch_s
    audio_seconds = BATCH * mel_ops.CHUNK_SECONDS
    rtfx = audio_seconds / batch_s
    # Roofline context: the decode loop is KV/weight-bandwidth-bound; the
    # achieved read bandwidth against the v5e HBM peak lets the single-chip
    # number stand on its own (vs_baseline's A100 figure is an estimate).
    decode_s = max(batch_s - prep_s, 1e-9)
    steps = total - 1   # random weights never emit EOS: full-length decode
    hbm_gbps = bytes_per_step * steps / decode_s / 1e9
    print(json.dumps({
        "metric": f"{MODEL} greedy transcription RTFx "
                  f"({'s8-MXU attention' if SCORES_INT8 else 'bf16'} + "
                  f"{'int4' if KV_INT4 else 'int8'} "
                  f"KV cache, batch {BATCH}, 256 new tokens, "
                  f"mel+encode+decode end-to-end)",
        "value": round(rtfx, 2),
        "unit": "audio-sec/sec",
        "vs_baseline": round(rtfx / REFERENCE_RTFX_A100_EST, 3),
        "hbm_gbps": round(hbm_gbps, 1),
        "roofline_frac": round(hbm_gbps / V5E_HBM_GBPS, 3),
        "prep_ms": round(prep_s * 1000, 1),
        "decode_ms_per_token": round(decode_s / steps * 1000, 3),
        "iters": ITERS,
        "spread_pct": round(spread_pct, 1),
        "batch_s_samples": [round(t, 4) for t in run_times],
    }))


if __name__ == "__main__":
    main()
