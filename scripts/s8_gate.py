"""Offline promotion gate for approximate decode paths (s8 scores / int4 KV).

`scores_int8` (ops/decode_cross.py) is an approximate path: queries and
attention probabilities are quantized to int8 so both contractions run
natively on the MXU. `--quant int4` gates the nibble-packed int4 KV cache
(quantize_kv4: 15 levels/row vs int8's 255 — half the KV traffic, coarser
values) against the default int8-KV decode instead. Real-weight WER cannot
be produced in a zero-egress environment, so this gate records the
strongest evidence available offline:

  for model in {small, medium, large} x batch sizes x BOTH greedy drivers
  (the evaluator's two-phase prep+decode_from_cache program and the direct
  single-program greedy_decode):
    - token agreement vs the exact/default path must be 1.0
      (random weights, full 256-token decode — the worst case for
      tie-breaking: real speech distributions are far peakier), and
    - the max absolute logit delta on probed decode steps is recorded
      (bounded, not thresholded — it contextualizes how close the paths run).

Emits one JSON report (S8_GATE.json / INT4_GATE.json); `"pass": true` is
the recorded basis for promoting the path to a default. Re-run with real
weights (`--models` + converted checkpoints) the day the environment
allows it.

Run on TPU (the fused kernel has no CPU build; on CPU this exercises the
jnp twin of the same math and says so in the report).

Note: the per-cell `decode_s_*` fields time the FIRST execution and so
include compile time — they are informational context only (use
scripts/benchmark.py for steady-state numbers); the gate verdict is
agreement-based.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe_logit_delta(cfg, params, mel, prompt, cand_cache, ref_cache,
                      n_steps=4, s8=True):
    """Max |logits_candidate - logits_reference| over the first n_steps
    forced steps. The candidate decodes with scores_int8=s8 (False when the
    candidate is an int4 CACHE — decode_step detects the packed layout)."""
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
        a = np.asarray(step(params, cand_cache, tok, pos, s8), np.float32)
        b = np.asarray(step(params, ref_cache, tok, pos, False), np.float32)
        worst = max(worst, float(np.abs(a - b).max()))
    return worst


def run_cell(model: str, batch: int, max_new_tokens: int, probe: bool,
             quant: str = "s8"):
    """One gate cell. quant="s8": fused s8-MXU scores (head-minor cache) vs
    exact bf16 scores, both on int8 KV. quant="int4": nibble-packed int4 KV
    vs the default int8 KV, both with bf16 scores (the candidate is the
    CACHE, so the decode flag stays False on both sides)."""
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
    int4 = quant == "int4"
    # Decode-flag for the candidate (a) and reference (b) programs; under
    # int4 the candidate is the cache layout, not a decode flag.
    s8_a, s8_b = (not int4), False

    import functools

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def prep(params, audio, head_minor, kv_int4):
        feats = mel_ops.log_mel_spectrogram(audio, cfg.num_mel_bins,
                                            dtype=jnp.bfloat16)
        feats = feats[:, :, :cfg.num_audio_frames]
        enc = whisper.encode(params, feats, cfg, flash=flash)
        return enc, whisper.init_cache(params, enc, cfg, max_len=total,
                                       cross_kv_int8=not kv_int4,
                                       self_kv_int8=not kv_int4,
                                       cross_kv_int4=kv_int4,
                                       self_kv_int4=kv_int4,
                                       head_minor=head_minor)
    # Candidate prep: head-minor int8 cache (s8 mode) or int4 cache (int4
    # mode); reference prep: the default classic int8 cache.
    prep = (prep.lower(params, audio, not int4, int4).compile(),
            prep.lower(params, audio, False, False).compile())

    @functools.partial(jax.jit, static_argnums=(3,))
    def dec(params, cache, prompt, s8):
        return greedy_decode_from_cache(params, cache, cfg, prompt,
                                        scores_int8=s8)

    # Driver 1: the evaluator's two-phase program pair. Caches are built
    # and freed ONE AT A TIME — two full caches plus the direct driver's
    # internal one exceed HBM at whisper-medium/large batch sizes.
    enc_a, cache_a = prep[0](params, audio)
    del enc_a
    t0 = time.perf_counter()
    tok_a = np.asarray(dec(params, cache_a, prompt, s8_a))
    t_a = time.perf_counter() - t0
    del cache_a
    enc_b, cache_b = prep[1](params, audio)
    del enc_b
    t0 = time.perf_counter()
    tok_b = np.asarray(dec(params, cache_b, prompt, s8_b))
    t_b = time.perf_counter() - t0
    del cache_b
    agree_twophase = float((tok_a == tok_b).all(axis=1).mean())

    # Driver 2: the direct single-program greedy_decode (transcribe path).
    @functools.partial(jax.jit, static_argnums=(3, 4))
    def direct(params, enc, prompt, s8, kv_int4):
        return greedy_decode(params, enc, cfg, prompt,
                             max_new_tokens=max_new_tokens,
                             cross_kv_int8=not kv_int4,
                             self_kv_int8=not kv_int4,
                             cross_kv_int4=kv_int4, self_kv_int4=kv_int4,
                             scores_int8=s8)
    enc, spare = prep[0](params, audio)
    del spare
    d_a = np.asarray(direct(params, enc, prompt, s8_a, int4))
    d_b = np.asarray(direct(params, enc, prompt, s8_b, False))
    del enc
    agree_direct = float((d_a == d_b).all(axis=1).mean())

    a_key, b_key = (("int4", "int8") if int4 else ("s8", "bf16"))
    cell = {
        "model": model, "batch": batch,
        "agreement_twophase": agree_twophase,
        "agreement_direct": agree_direct,
        f"decode_s_{a_key}": round(t_a, 3),
        f"decode_s_{b_key}": round(t_b, 3),
    }
    if probe:
        _, cache_a = prep[0](params, audio)
        _, cache_b = prep[1](params, audio)
        cell["max_logit_delta"] = round(
            probe_logit_delta(cfg, params, audio, prompt, cache_a, cache_b,
                              s8=s8_a),
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
    p.add_argument("--quant", choices=["s8", "int4"], default="s8",
                   help="Which approximate path to gate: s8 = fused s8-MXU "
                        "attention scores; int4 = nibble-packed int4 KV "
                        "cache (vs the default int8 KV)")
    p.add_argument("--output", default=None,
                   help="Report path (default S8_GATE.json / INT4_GATE.json "
                        "per --quant)")
    args = p.parse_args(argv)
    output = args.output or (
        "INT4_GATE.json" if args.quant == "int4" else "S8_GATE.json")

    import jax
    cells = []
    for model in args.models:
        for batch in args.batches:
            print(f"gate cell {model} B={batch} ...", flush=True)
            cell = run_cell(model, batch, args.max_new_tokens,
                            probe=not args.no_probe, quant=args.quant)
            print(json.dumps(cell), flush=True)
            cells.append(cell)

    ok = all(c["agreement_twophase"] == 1.0 and c["agreement_direct"] == 1.0
             for c in cells)
    report = {
        "backend": jax.default_backend(),
        "quant": args.quant,
        "fused_kernel": args.quant == "s8" and jax.default_backend() == "tpu",
        "max_new_tokens": args.max_new_tokens,
        "pass": ok,
        "cells": cells,
    }
    from pathlib import Path
    Path(output).write_text(json.dumps(report, indent=2))
    print(json.dumps({"pass": ok, "cells": len(cells),
                      "backend": report["backend"]}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
