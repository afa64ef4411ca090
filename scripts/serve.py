#!/usr/bin/env python
"""HTTP transcription server over the micro-batching service.

The reference has no serving surface at all; this fronts
sar_tpu.serving.TranscriptionService (dynamic batching over the compiled
TPU pipeline) with a dependency-free stdlib HTTP API:

  POST /v1/transcribe?language=hindi     body: a WAV file
      -> {"text": ..., "language": ..., "seconds": ..., "latency_ms": ...}
  GET  /healthz                          -> {"ok": true}
  GET  /stats                            -> service counters + latency pcts

Concurrent client connections each block in their own handler thread
(ThreadingHTTPServer) while their rows coalesce into device batches —
N clients cost ceil(N / batch_size) decode programs, not N.

With --classifier/--adapters the server routes: per-request LID picks the
adapter + decoder prompt per row inside one compiled program, and the
response carries the detected language.
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import sys
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("serve")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Serve transcription over HTTP")
    p.add_argument("--model", type=str, default="whisper-small")
    p.add_argument("--language", type=str, default="hindi",
                   help="Default language when the request does not say")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="LoRA adapter dir (single-adapter serving)")
    p.add_argument("--classifier", type=str, default=None,
                   help="LID classifier dir -> routed serving")
    p.add_argument("--adapters", type=str, nargs="*", default=None,
                   metavar="LANG=DIR", help="Per-language adapter dirs "
                   "(routed serving, with --classifier)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=10.0)
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--task", type=str, default="transcribe",
                   choices=["transcribe", "translate"],
                   help="translate = X -> English speech translation "
                        "(plain serving only; routed mode is "
                        "transcription-only)")
    p.add_argument("--kv_cache", type=str, default="int8",
                   choices=["int8", "bf16", "int4"],
                   help="KV-cache precision of the compiled decode program "
                        "(int4 = nibble-packed, half the int8 traffic at "
                        "coarser quantization)")
    p.add_argument("--attn_scores", type=str, default="bf16",
                   choices=["bf16", "int8"],
                   help="int8 = the fused s8-MXU attention decode kernel "
                        "(greedy non-routed serving; requires int8 KV)")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"],
                   help="Force a JAX backend (default: environment's)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    return p.parse_args(argv)


def wav_bytes_to_audio(data: bytes):
    """Decode a WAV payload to mono float32 @ 16 kHz."""
    import numpy as np

    from sar_tpu.data.preprocessing import resample
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width != 2:
        raise ValueError(f"only 16-bit PCM wav supported, got width={width}")
    audio = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
    if n_ch > 1:
        audio = audio.reshape(-1, n_ch).mean(axis=1)
    if sr != 16_000:
        audio = resample(audio, sr, 16_000)
    return audio


def build_service(args):
    import jax.numpy as jnp

    from sar_tpu.data.tokenizer import get_tokenizer
    from sar_tpu.models import lora as lora_lib
    from sar_tpu.models.base import load_base_model
    from sar_tpu.serving import TranscriptionService

    cfg, params = load_base_model(args.model, dtype=jnp.bfloat16)
    tokenizer = get_tokenizer(args.model, language=args.language)
    if args.classifier:
        from sar_tpu.models import classifier as clf
        from sar_tpu.models.router import build_router_from_checkpoints
        clf_params, clf_cfg, _ = clf.load_classifier(args.classifier)
        adapter_dirs = dict(kv.split("=", 1) for kv in (args.adapters or []))
        missing = [l for l in clf_cfg.languages if l not in adapter_dirs]
        if missing:
            raise SystemExit(f"--adapters missing for: {missing}")
        router = build_router_from_checkpoints(cfg, params, adapter_dirs,
                                               clf_params, clf_cfg)
        logger.info("routed serving over %s", clf_cfg.languages)
        return TranscriptionService(
            router=router, tokenizer=tokenizer, batch_size=args.batch_size,
            max_wait_ms=args.max_wait_ms, max_new_tokens=args.max_new_tokens,
            kv_int8=args.kv_cache == "int8", kv_int4=args.kv_cache == "int4",
            # The service guard warn-disables this for routed mode — pass it
            # through so the user SEES the flag was dropped instead of it
            # silently vanishing here.
            scores_int8=args.attn_scores == "int8")
    lora = None
    lora_scale = 1.0
    if args.checkpoint:
        ckpt = Path(args.checkpoint)
        adapter = ckpt / "adapter" if (ckpt / "adapter").exists() else ckpt
        lora, lcfg, _ = lora_lib.load_any_adapter(adapter, cfg)
        lora_scale = lcfg.scale
        logger.info("adapter %s (r=%d alpha=%d)", adapter, lcfg.r, lcfg.alpha)
    return TranscriptionService(
        cfg, params, tokenizer, language=args.language, lora=lora,
        lora_scale=lora_scale, batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms, max_new_tokens=args.max_new_tokens,
        num_beams=args.num_beams, task=args.task,
        kv_int8=args.kv_cache == "int8", kv_int4=args.kv_cache == "int4",
        scores_int8=args.attn_scores == "int8")


class Handler(BaseHTTPRequestHandler):
    service = None                      # set by make_server

    def _json(self, code: int, obj) -> None:
        body = json.dumps(obj, ensure_ascii=False).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *fmt_args):  # route through logging
        logger.debug(fmt, *fmt_args)

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/healthz":
            self._json(200, {"ok": True})
        elif path == "/stats":
            self._json(200, self.service.stats())
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        import queue as queue_mod
        url = urlparse(self.path)
        if url.path != "/v1/transcribe":
            self._json(404, {"error": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            audio = wav_bytes_to_audio(data)
            language = (parse_qs(url.query).get("language", [None])[0])
            t0 = time.monotonic()
            req = self.service.submit(audio, language=language, block=False)
            text = req.result(timeout=600.0)
            self._json(200, {
                "text": text,
                "language": req.detected or language,
                "seconds": round(len(audio) / 16_000, 3),
                "latency_ms": round((time.monotonic() - t0) * 1e3, 1)})
        except queue_mod.Full:
            self._json(503, {"error": "saturated, retry later"})
        except (wave.Error, EOFError, ValueError) as e:
            self._json(400, {"error": str(e) or type(e).__name__})
        except Exception as e:          # noqa: BLE001
            logger.exception("request failed")
            self._json(500, {"error": str(e)})


def make_server(service, host: str = "127.0.0.1", port: int = 0):
    """ThreadingHTTPServer bound to (host, port); port 0 picks a free one."""
    handler = type("BoundHandler", (Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    service = build_service(args)
    server = make_server(service, args.host, args.port)
    logger.info("serving on http://%s:%d (batch=%d, wait=%.0fms)",
                *server.server_address, args.batch_size, args.max_wait_ms)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
