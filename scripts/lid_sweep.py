"""LID architecture sweep — encoder tap layer x pooling -> LID_BENCH.json.

The reference's Phase-2 exposes `--encoder_layer` and `--pooling` but never
records which combination to use (/root/reference/scripts/train_router.py:
692-883 — the >95% accuracy target of PROJECT_REQUIREMENTS.md:999-1004 has
no committed artifact). This driver trains the LID head for every grid cell
on the hermetic synthetic corpus (sar_tpu/data/synthetic.py — per-language
accent bands, no network), evaluates accuracy / per-class / confusion, and
times the per-utterance feature-extraction cost of each tap depth (earlier
taps run fewer encoder layers — the prefix scan in
classifier.encode_features), so the default architecture choice is pinned
by a measurement instead of a guess.

Run on TPU for the latency numbers; everything also runs on CPU (slower).
Real-weight accuracy still needs real audio — this artifact pins the
ARCHITECTURE choice; jobs/train_lid.sh re-runs the winner on real data when
the environment allows.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("lid_sweep")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, default="whisper-small")
    p.add_argument("--languages", type=str, nargs="+",
                   default=["hindi", "italian", "punjabi", "telugu"])
    p.add_argument("--layers", type=int, nargs="+", default=[-1, 3, 6, 9],
                   help="Encoder tap depths to sweep (--encoder_layer values; "
                        "-1 = final post-LN output)")
    p.add_argument("--poolings", type=str, nargs="+",
                   default=["mean", "max", "attention"])
    p.add_argument("--samples_per_language", type=int, default=128)
    p.add_argument("--eval_samples_per_language", type=int, default=48)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_steps", type=int, default=300)
    p.add_argument("--warmup_steps", type=int, default=30)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--iters", type=int, default=10,
                   help="Timing iterations for the per-tap latency row")
    p.add_argument("--output", type=str, default="LID_BENCH.json")
    p.add_argument("--platform", type=str, default="auto")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import numpy as np

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from sar_tpu.data.collate import LIDCollator
    from sar_tpu.data.loader import DataLoader
    from sar_tpu.data.synthetic import SyntheticASRDataset
    from sar_tpu.models import classifier as clf
    from sar_tpu.models import whisper
    from sar_tpu.models.config import get_config
    from sar_tpu.training.lid_trainer import (LIDDataset, LIDTrainer,
                                              LIDTrainingArgs)

    cfg = get_config(args.model)
    params = whisper.cast_params(
        whisper.init_params(jax.random.PRNGKey(args.seed), cfg), jnp.bfloat16)

    def build(split_seed, size):
        return {
            lang: SyntheticASRDataset(cfg, size=size, language=lang,
                                      language_id=i, seed=split_seed)
            for i, lang in enumerate(args.languages)
        }

    train_sets = build(args.seed, args.samples_per_language)
    eval_sets = build(args.seed + 777, args.eval_samples_per_language)
    train_lid = LIDDataset(train_sets, args.languages, seed=args.seed)
    eval_lid = LIDDataset(eval_sets, args.languages, seed=args.seed)
    coll = LIDCollator(num_mels=cfg.num_mel_bins,
                       num_frames=cfg.num_audio_frames)

    # One latency row per tap depth (pooling-independent: the encoder
    # dominates; the head is a few matmuls over pooled features).
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (args.batch_size, cfg.num_mel_bins, cfg.num_audio_frames)) * 0.1,
        jnp.bfloat16)
    flash = "hm" if jax.default_backend() == "tpu" else False
    tap_ms = {}
    for layer in args.layers:
        feats_fn = jax.jit(lambda p, m, layer=layer: clf.encode_features(
            p, m, cfg, layer_index=layer, flash=flash))
        out = feats_fn(params, mel)
        np.asarray(out[0, 0])                        # warm + fence
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = feats_fn(params, mel)
        np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / args.iters
        tap_ms[layer] = dt * 1000 / args.batch_size
        logger.info("tap layer %d: %.3f ms/utt (batch %d)", layer,
                    tap_ms[layer], args.batch_size)

    results = []
    for layer in args.layers:
        # Frozen-encoder features depend on the tap layer but not the
        # pooling: compute them ONCE per layer and train every head on the
        # device-resident cache (LIDTrainer.train_cached — no per-step mel
        # transfer or encoder FLOPs).
        feats_cache = None
        for pooling in args.poolings:
            ccfg = clf.ClassifierConfig(
                input_dim=cfg.d_model, num_classes=len(args.languages),
                pooling=pooling, languages=tuple(args.languages),
                encoder_layer=layer)
            clf_params = clf.init_classifier(jax.random.PRNGKey(args.seed),
                                             ccfg)
            targs = LIDTrainingArgs(
                learning_rate=args.learning_rate,
                warmup_steps=args.warmup_steps, max_steps=args.max_steps,
                eval_steps=0, encoder_layer=layer, seed=args.seed)
            trainer = LIDTrainer(cfg, params, clf_params, ccfg, targs)
            if feats_cache is None:
                feats_cache = (
                    trainer.precompute_features(
                        DataLoader(train_lid, args.batch_size, coll,
                                   shuffle=False, drop_last=False)),
                    trainer.precompute_features(
                        DataLoader(eval_lid, args.batch_size, coll,
                                   shuffle=False, drop_last=False)))
            (tr_f, tr_l), (ev_f, ev_l) = feats_cache
            t0 = time.perf_counter()
            trainer.train_cached(tr_f, tr_l, batch_size=args.batch_size)
            train_s = time.perf_counter() - t0
            m = trainer.evaluate_cached(ev_f, ev_l)
            row = {"encoder_layer": layer, "pooling": pooling,
                   "accuracy": round(m["accuracy"], 4),
                   "per_class_accuracy":
                       {k: round(v, 4) for k, v in
                        m["per_class_accuracy"].items()},
                   "confusion_matrix": m["confusion_matrix"],
                   "eval_loss": round(m["eval_loss"], 4),
                   "lid_ms_per_utt": round(tap_ms[layer], 3),
                   "train_s": round(train_s, 1)}
            results.append(row)
            logger.info("layer=%d pooling=%s -> acc=%.4f (%.3f ms/utt)",
                        layer, pooling, m["accuracy"], tap_ms[layer])

    # Default choice: highest accuracy; ties broken by cheapest tap.
    best = max(results, key=lambda r: (r["accuracy"], -r["lid_ms_per_utt"]))
    payload = {
        "model": args.model,
        "corpus": ("synthetic per-language accent bands "
                   "(sar_tpu/data/synthetic.py) — architecture-choice "
                   "artifact; real-weight accuracy needs real audio "
                   "(jobs/train_lid.sh)"),
        "languages": args.languages,
        "samples_per_language": args.samples_per_language,
        "max_steps": args.max_steps,
        "batch_size": args.batch_size,
        "backend": jax.default_backend(),
        "phase2_target_accuracy": 0.95,
        "results": results,
        "chosen_default": {"encoder_layer": best["encoder_layer"],
                           "pooling": best["pooling"],
                           "accuracy": best["accuracy"],
                           "lid_ms_per_utt": best["lid_ms_per_utt"]},
    }
    Path(args.output).write_text(json.dumps(payload, indent=2) + "\n")
    logger.info("wrote %s; chosen default: layer=%d pooling=%s acc=%.4f",
                args.output, best["encoder_layer"], best["pooling"],
                best["accuracy"])


if __name__ == "__main__":
    main()
