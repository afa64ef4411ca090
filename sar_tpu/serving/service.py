"""Dynamic micro-batching transcription service.

TPU-first serving: XLA programs want static shapes and big batches, but
requests arrive one at a time. The service bridges the two with a single
background worker that coalesces queued requests into fixed-size batches
(pad rows are zero audio), so exactly TWO programs ever compile — the
mel+encode+cache prep and the donated greedy decode loop — and every
request, alone or in a burst, rides them. Per-request languages are data,
not code: the decoder prompt is a traced [B, P] argument, so one compiled
program serves mixed-language batches (the reference's substrate would
re-`generate` per language; its router loops per sample,
/root/reference/src/models/adapter_router.py:744-750).

Routed mode: pass an `AdapterRouter` instead of a fixed language and the
batch runs LID -> per-row adapter gather (BGMV) -> routed decode, again as
one compiled program — the reference's Phase-2 serving story that its own
codebase never had a daemon for.
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sar_tpu.ops import mel as mel_ops

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class _Request:
    audio: np.ndarray
    language: str | None
    done: threading.Event
    t_submit: float
    text: str | None = None
    detected: str | None = None
    error: BaseException | None = None

    def result(self, timeout: float | None = None) -> str:
        if not self.done.wait(timeout):
            raise TimeoutError("transcription timed out")
        if self.error is not None:
            raise self.error
        return self.text


class TranscriptionService:
    """Micro-batching front over the compiled transcription pipeline.

    Thread-safe: `transcribe`/`submit` may be called from any number of
    threads; one worker thread owns the device. Use as a context manager
    or call `close()` to stop the worker (pending requests drain first).
    """

    def __init__(self, cfg=None, params=None, tokenizer=None, *,
                 language: str = "hindi", router=None,
                 batch_size: int = 8, max_wait_ms: float = 10.0,
                 max_new_tokens: int = 256, num_beams: int = 1,
                 lora: dict | None = None,
                 lora_scale: float = 1.0, kv_int8: bool = True,
                 flash: str | bool = "auto", max_queue: int = 512,
                 task: str = "transcribe", kv_int4: bool = False,
                 scores_int8: bool = False):
        if tokenizer is None or (router is None
                                 and (cfg is None or params is None)):
            raise ValueError("need cfg+params+tokenizer, or a "
                             "router+tokenizer")
        if router is not None and num_beams > 1:
            raise ValueError("routed serving decodes greedily "
                             "(no beam-routed program)")
        if router is not None and task != "transcribe":
            raise ValueError("routed serving is transcription-only (the "
                             "router's adapters are transcription-trained)")
        self.num_beams = num_beams
        self.router = router
        if router is not None:
            self.cfg = router.cfg
            self.params = router.base_params
        else:
            self.cfg = cfg
            self.params = params
        self.tokenizer = tokenizer
        self.language = language
        self.task = task
        self.batch_size = batch_size
        self.max_wait_ms = max_wait_ms
        self.max_new_tokens = max_new_tokens
        self.lora = lora
        self.lora_scale = lora_scale
        # Same precision surface as ASREvaluator: int4 (nibble-packed)
        # supersedes int8 when set; scores_int8 = the fused s8-MXU decode
        # kernel (greedy or beam-folded, non-routed).
        self.kv_int4 = kv_int4
        self.kv_int8 = kv_int8 and not kv_int4
        if scores_int8 and kv_int4:
            raise ValueError("scores_int8 (the s8-MXU path) does not compose "
                             "with an int4-packed KV cache")
        if scores_int8 and not self.kv_int8:
            raise ValueError("scores_int8 requires kv_int8=True")
        if scores_int8 and router is not None:
            logger.warning("scores_int8 applies to the non-routed serving "
                           "programs; decoding with bf16 scores")
            scores_int8 = False
        if scores_int8 and num_beams > 1:
            # Same surface as ASREvaluator: beams + scores_int8 ride the
            # beam-folded fused kernel (agreement-validated on v5e) — honor
            # the opt-in but surface the measured cost (5.45 vs 4.44
            # ms/token at whisper-small B=16 beam-4, PARITY.md r03).
            logger.info("beams + scores_int8 uses the beam-folded fused "
                        "kernel; it measured SLOWER than bf16 scores at "
                        "small batch on v5e — benchmark both for your shape")
        self.scores_int8 = scores_int8
        self.flash = (("hm" if jax.default_backend() == "tpu" else False)
                      if flash == "auto" else flash)
        self._build()
        self._q: queue.Queue[_Request] = queue.Queue(max_queue)
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._stats = {"requests": 0, "batches": 0, "errors": 0,
                       "rows_served": 0}
        self._latencies: list[float] = []       # rolling, under _lock
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="sar-serving-worker")
        self._worker.start()

    # -- compiled pipeline --------------------------------------------------

    def _build(self):
        cfg = self.cfg
        P = len(cfg.prompt_ids(self.language, self.task))
        total = min(P + self.max_new_tokens, cfg.max_target_positions)
        lora, scale, kv = self.lora, self.lora_scale, self.kv_int8
        flash = self.flash

        if self.router is not None:
            router = self.router

            def routed(params, audio):
                from sar_tpu.decode.greedy import greedy_decode
                from sar_tpu.models import classifier as clf
                from sar_tpu.models import whisper
                feats = mel_ops.log_mel_spectrogram(
                    audio, cfg.num_mel_bins,
                    dtype=jax.tree.leaves(params)[0].dtype)
                feats = feats[:, :, :cfg.num_audio_frames]
                hid = clf.encode_features(
                    params, feats, cfg,
                    layer_index=router.clf_cfg.encoder_layer,
                    flash=self.flash)
                idx, probs = clf.predict(router.clf_params, router.clf_cfg,
                                         hid)
                idx = idx.astype(jnp.int32)
                enc = whisper.encode(params, feats, cfg, lora=router.bank,
                                     adapter_idx=idx,
                                     lora_scale=router.lora_cfg.scale,
                                     flash=self.flash)
                prompts = router._prompts[idx]
                tokens = greedy_decode(params, enc, cfg, prompts,
                                       max_new_tokens=self.max_new_tokens,
                                       lora=router.bank, adapter_idx=idx,
                                       lora_scale=router.lora_cfg.scale,
                                       cross_kv_int8=self.kv_int8,
                                       self_kv_int8=self.kv_int8,
                                       cross_kv_int4=self.kv_int4,
                                       self_kv_int4=self.kv_int4)
                return tokens, idx, probs

            self._routed = jax.jit(routed)
            self._prompt_len = router.prompt_len
            return

        from sar_tpu.models import whisper

        kv4 = self.kv_int4
        s8 = self.scores_int8

        def prep(params, audio):
            feats = mel_ops.log_mel_spectrogram(
                audio, cfg.num_mel_bins,
                dtype=jax.tree.leaves(params)[0].dtype)
            feats = feats[:, :, :cfg.num_audio_frames]
            enc = whisper.encode(params, feats, cfg, lora=lora,
                                 lora_scale=scale, flash=flash)
            return whisper.init_cache(params, enc, cfg, max_len=total,
                                      lora=lora, lora_scale=scale,
                                      cross_kv_int8=kv, self_kv_int8=kv,
                                      cross_kv_int4=kv4, self_kv_int4=kv4,
                                      head_minor=whisper.use_head_minor(
                                          cross_kv_int8=kv, self_kv_int8=kv,
                                          cross_kv_int4=kv4,
                                          self_kv_int4=kv4,
                                          scores_int8=s8))

        def dec(params, cache, prompts):
            from sar_tpu.decode.greedy import greedy_decode_from_cache
            return greedy_decode_from_cache(params, cache, cfg, prompts,
                                            lora=lora, lora_scale=scale,
                                            scores_int8=s8,
                                            return_cache=True)

        def beam(params, audio, prompts):
            from sar_tpu.decode.beam import beam_decode
            feats = mel_ops.log_mel_spectrogram(
                audio, cfg.num_mel_bins,
                dtype=jax.tree.leaves(params)[0].dtype)
            feats = feats[:, :, :cfg.num_audio_frames]
            enc = whisper.encode(params, feats, cfg, lora=lora,
                                 lora_scale=scale, flash=flash)
            return beam_decode(params, enc, cfg, prompts,
                               num_beams=self.num_beams,
                               max_new_tokens=self.max_new_tokens,
                               lora=lora, lora_scale=scale,
                               cross_kv_int8=kv, self_kv_int8=kv,
                               cross_kv_int4=kv4, self_kv_int4=kv4,
                               scores_int8=s8)

        self._prep = jax.jit(prep)
        self._dec = jax.jit(dec, donate_argnums=(1,))
        self._beam = jax.jit(beam)
        self._prompt_len = P

    # -- public API ---------------------------------------------------------

    def submit(self, audio: np.ndarray, language: str | None = None,
               block: bool = True) -> _Request:
        """Enqueue; returns a handle with `.result(timeout)`. Raises
        queue.Full when the service is saturated and block=False
        (backpressure — HTTP layer turns it into 503). Invalid requests
        (unknown language, audio beyond the model window) are rejected
        HERE with ValueError so one bad request can never fail the
        micro-batch it would have joined."""
        if self._stop.is_set():
            raise RuntimeError("service is closed")
        audio = np.asarray(audio, np.float32)
        max_samples = self.cfg.num_audio_frames * 160   # mel hop @16 kHz
        if len(audio) > max_samples:
            raise ValueError(
                f"audio is {len(audio) / 16000:.1f} s; the serving window "
                f"is {max_samples / 16000:.1f} s — chunk long clips "
                "client-side or use transcribe.py --longform")
        if language is not None and self.router is None:
            self.cfg.prompt_ids(language)   # raises for unknown languages
        req = _Request(audio, language, threading.Event(), time.monotonic())
        self._q.put(req, block=block)
        with self._lock:
            self._stats["requests"] += 1
        return req

    def transcribe(self, audio: np.ndarray, language: str | None = None,
                   timeout: float | None = None) -> str:
        return self.submit(audio, language).result(timeout)

    def stats(self) -> dict[str, Any]:
        with self._lock:
            out = dict(self._stats)
            lats = list(self._latencies)
        out["queue_depth"] = self._q.qsize()
        out["batch_size"] = self.batch_size
        if lats:
            lats.sort()
            out["latency_ms_p50"] = round(lats[len(lats) // 2] * 1e3, 2)
            out["latency_ms_p95"] = round(
                lats[min(len(lats) - 1, int(len(lats) * 0.95))] * 1e3, 2)
        return out

    def close(self, drain: bool = True) -> None:
        """Stop the worker. drain=True serves what is already queued (the
        worker keeps batching until the queue is empty, then exits);
        drain=False errors pending requests out immediately."""
        if not drain:
            while True:
                try:
                    req = self._q.get_nowait()
                except queue.Empty:
                    break
                req.error = RuntimeError("service closed")
                req.done.set()
        self._stop.set()
        self._worker.join(timeout=120.0)
        while True:                      # anything the worker left behind
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            req.error = RuntimeError("service closed")
            req.done.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker -------------------------------------------------------------

    def _loop(self):
        while True:
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                if self._stop.is_set():
                    return
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait_ms / 1e3
            while len(batch) < self.batch_size:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            self._process(batch)

    def _process(self, batch: list[_Request]) -> None:
        try:
            n = len(batch)
            pad = self.batch_size - n
            audio = mel_ops.stack_pad_audio(
                [r.audio for r in batch] + [np.zeros(1, np.float32)] * pad)
            if self.router is not None:
                tokens, idx, _ = self._routed(self.params, jnp.asarray(audio))
                detected = [self.router.languages[int(i)]
                            for i in np.asarray(idx)[:n]]
            else:
                prompts = jnp.asarray(
                    [self.cfg.prompt_ids(r.language or self.language,
                                         self.task)
                     for r in batch]
                    + [self.cfg.prompt_ids(self.language,
                                           self.task)] * pad, jnp.int32)
                if self.num_beams > 1:
                    tokens = self._beam(self.params, jnp.asarray(audio),
                                        prompts)
                else:
                    cache = self._prep(self.params, jnp.asarray(audio))
                    tokens, spent = self._dec(self.params, cache, prompts)
                    del spent
                detected = [None] * n
            from sar_tpu.decode.greedy import transcribe_tokens
            ids = transcribe_tokens(tokens[:n], self.cfg,
                                    prompt_len=self._prompt_len)
            now = time.monotonic()
            with self._lock:
                self._stats["batches"] += 1
                self._stats["rows_served"] += n
                for r in batch:
                    self._latencies.append(now - r.t_submit)
                del self._latencies[:-1000]
            for req, row, det in zip(batch, ids, detected):
                req.text = self.tokenizer.decode(row)
                req.detected = det
                req.done.set()
        except BaseException as e:      # noqa: BLE001 — fan the error out
            logger.exception("serving batch failed")
            with self._lock:
                self._stats["errors"] += 1
            for req in batch:
                req.error = e
                req.done.set()
