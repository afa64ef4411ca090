"""Offline promotion gate for the fused s8-MXU attention decode path.

`scores_int8` (ops/decode_cross.py) is an approximate path: queries and
attention probabilities are quantized to int8 so both contractions run
natively on the MXU. Real-weight WER cannot be produced in a zero-egress
environment, so this gate records the strongest evidence available offline:

  for model in {small, medium, large} x batch sizes x BOTH greedy drivers
  (the evaluator's two-phase prep+decode_from_cache program and the direct
  single-program greedy_decode):
    - token agreement vs the exact bf16-scores int8-KV path must be 1.0
      (random weights, full 256-token decode — the worst case for
      tie-breaking: real speech distributions are far peakier), and
    - the max absolute logit delta on probed decode steps is recorded
      (bounded, not thresholded — it contextualizes how close the paths run).

Emits one JSON report (S8_GATE.json); `"pass": true` is the recorded basis
for promoting scores_int8 to a default. Re-run with real weights
(`--models` + converted checkpoints) the day the environment allows it.

Run on TPU (the fused kernel has no CPU build; on CPU this exercises the
jnp twin of the same math and says so in the report).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe_logit_delta(cfg, params, mel, prompt, scores_int8_cache, exact_cache,
                      n_steps=4):
    """Max |logits_s8 - logits_bf16| over the first n_steps forced steps."""
    import functools

    import jax
    import jax.numpy as jnp
    from sar_tpu.models import whisper

    @functools.partial(jax.jit, static_argnums=(4,))
    def step(params, cache, tok, pos, s8):
        return whisper.decode_step(params, tok, pos, cache, cfg,
                                   scores_int8=s8)[0]

    worst = 0.0
    B = mel.shape[0]
    for pos in range(min(n_steps, prompt.shape[0])):
        tok = jnp.broadcast_to(prompt[pos], (B,))
        import numpy as np
        a = np.asarray(step(params, scores_int8_cache, tok, pos, True),
                       np.float32)
        b = np.asarray(step(params, exact_cache, tok, pos, False), np.float32)
        worst = max(worst, float(np.abs(a - b).max()))
    return worst


def run_cell(model: str, batch: int, max_new_tokens: int, probe: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sar_tpu.decode.greedy import greedy_decode, greedy_decode_from_cache
    from sar_tpu.models import whisper
    from sar_tpu.models.config import get_config
    from sar_tpu.ops import mel as mel_ops

    cfg = get_config(model)
    params = whisper.cast_params(
        whisper.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)
    total = min(prompt.shape[0] + max_new_tokens, cfg.max_target_positions)
    rng = np.random.default_rng(batch)
    audio = jnp.asarray(
        rng.standard_normal((batch, mel_ops.N_SAMPLES)) * 0.1, jnp.float32)
    flash = "hm" if jax.default_backend() == "tpu" else False

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def prep(params, audio, head_minor):
        feats = mel_ops.log_mel_spectrogram(audio, cfg.num_mel_bins,
                                            dtype=jnp.bfloat16)
        feats = feats[:, :, :cfg.num_audio_frames]
        enc = whisper.encode(params, feats, cfg, flash=flash)
        return enc, whisper.init_cache(params, enc, cfg, max_len=total,
                                       cross_kv_int8=True, self_kv_int8=True,
                                       head_minor=head_minor)
    prep = (prep.lower(params, audio, True).compile(),
            prep.lower(params, audio, False).compile())

    @functools.partial(jax.jit, static_argnums=(3,))
    def dec(params, cache, prompt, s8):
        return greedy_decode_from_cache(params, cache, cfg, prompt,
                                        scores_int8=s8)

    # Driver 1: the evaluator's two-phase program pair. Caches are built
    # and freed ONE AT A TIME — two full caches plus the direct driver's
    # internal one exceed HBM at whisper-medium/large batch sizes.
    enc_s8, cache_s8 = prep[0](params, audio)
    del enc_s8
    t0 = time.perf_counter()
    tok_s8 = np.asarray(dec(params, cache_s8, prompt, True))
    t_s8 = time.perf_counter() - t0
    del cache_s8
    enc_bf, cache_bf = prep[1](params, audio)
    del enc_bf
    t0 = time.perf_counter()
    tok_bf = np.asarray(dec(params, cache_bf, prompt, False))
    t_bf = time.perf_counter() - t0
    del cache_bf
    agree_twophase = float((tok_s8 == tok_bf).all(axis=1).mean())

    # Driver 2: the direct single-program greedy_decode (transcribe path).
    @functools.partial(jax.jit, static_argnums=(3,))
    def direct(params, enc, prompt, s8):
        return greedy_decode(params, enc, cfg, prompt,
                             max_new_tokens=max_new_tokens,
                             cross_kv_int8=True, self_kv_int8=True,
                             scores_int8=s8)
    enc, spare = prep[0](params, audio)
    del spare
    d_s8 = np.asarray(direct(params, enc, prompt, True))
    d_bf = np.asarray(direct(params, enc, prompt, False))
    del enc
    agree_direct = float((d_s8 == d_bf).all(axis=1).mean())

    cell = {
        "model": model, "batch": batch,
        "agreement_twophase": agree_twophase,
        "agreement_direct": agree_direct,
        "decode_s_s8": round(t_s8, 3), "decode_s_bf16": round(t_bf, 3),
    }
    if probe:
        _, cache_s8 = prep[0](params, audio)
        _, cache_bf = prep[1](params, audio)
        cell["max_logit_delta"] = round(
            probe_logit_delta(cfg, params, audio, prompt, cache_s8, cache_bf),
            5)
    return cell


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+",
                   default=["whisper-small", "whisper-medium",
                            "whisper-large"])
    p.add_argument("--batches", nargs="+", type=int, default=[8, 64])
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--no_probe", action="store_true",
                   help="Skip the per-step logit-delta probe")
    p.add_argument("--output", default="S8_GATE.json")
    args = p.parse_args(argv)

    import jax
    cells = []
    for model in args.models:
        for batch in args.batches:
            print(f"gate cell {model} B={batch} ...", flush=True)
            cell = run_cell(model, batch, args.max_new_tokens,
                            probe=not args.no_probe)
            print(json.dumps(cell), flush=True)
            cells.append(cell)

    ok = all(c["agreement_twophase"] == 1.0 and c["agreement_direct"] == 1.0
             for c in cells)
    report = {
        "backend": jax.default_backend(),
        "fused_kernel": jax.default_backend() == "tpu",
        "max_new_tokens": args.max_new_tokens,
        "pass": ok,
        "cells": cells,
    }
    from pathlib import Path
    Path(args.output).write_text(json.dumps(report, indent=2))
    print(json.dumps({"pass": ok, "cells": len(cells),
                      "backend": report["backend"]}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
