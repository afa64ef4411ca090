#!/usr/bin/env python
"""Evaluate a trained LoRA adapter: transcribe a split, compute WER/CER.

CLI parity with /root/reference/scripts/evaluate_model.py:27-81 (checkpoint
required, split default test, num_beams, save_predictions -> metrics.json +
predictions.txt/references.txt, :154-188). `--checkpoint none` evaluates the
zero-shot base model (the reference's baseline workflow,
test_inference_run.py).
"""

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("evaluate_model")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate ASR model (TPU)")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Adapter checkpoint dir (or 'none' for zero-shot base)")
    p.add_argument("--model", type=str, default="whisper-small",
                   choices=["whisper-tiny", "whisper-base", "whisper-small",
                            "whisper-medium", "whisper-large", "whisper-test"])
    p.add_argument("--language", type=str, required=True)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--data_sources", type=str, nargs="+",
                   default=["common_voice"])
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--task", type=str, default="transcribe",
                   choices=["transcribe", "translate"],
                   help="translate = X -> English speech translation; refs "
                        "must be English translations for the WER to mean "
                        "anything")
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["no", "fp16", "bf16"])
    p.add_argument("--kv_cache", type=str, default="int8",
                   choices=["int8", "bf16", "int4"],
                   help="KV cache precision (int8 halves decode memory "
                        "traffic; int4 nibble-packs it to a quarter, "
                        "coarser quantization — opt-in; bf16 for exact "
                        "parity)")
    p.add_argument("--attn_scores", type=str, default="bf16",
                   choices=["bf16", "int8"],
                   help="int8 = s8-MXU attention (fused Pallas kernel on "
                        "TPU; approximate, requires --kv_cache int8) — THE "
                        "flag for real-weight WER gating of the fast path")
    p.add_argument("--platform", type=str, default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="Pin the jax platform (cpu + "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                        "gives an N-device virtual mesh)")
    p.add_argument("--dp", type=int, default=1,
                   help="Data-parallel mesh axis for batch inference")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel mesh axis (ICI-sharded encoder/"
                        "decoder for whisper-large batch inference)")
    p.add_argument("--dcn_dp", type=int, default=1,
                   help="Data-parallel replicas over DCN (multi-slice/multi-host)")
    p.add_argument("--best_of", type=int, default=1,
                   help="Sampled candidates per --fallback escalation pass "
                        "at T > 0 (openai best_of)")
    p.add_argument("--fallback", action="store_true",
                   help="openai-style temperature fallback during "
                        "evaluation (greedy, single-chip)")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--save_predictions", action="store_true")
    p.add_argument("--per_sample", action="store_true",
                   help="Also compute per-sample WER/CER rows")
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from sar_tpu.data.collate import create_collator
    from sar_tpu.data.datasets import create_dataset
    from sar_tpu.data.loader import DataLoader
    from sar_tpu.data.tokenizer import get_tokenizer
    from sar_tpu.evaluation.evaluator import ASREvaluator
    from sar_tpu.models import lora as lora_lib
    from sar_tpu.models.base import load_base_model

    dtype = {"no": jnp.float32, "fp16": jnp.bfloat16,
             "bf16": jnp.bfloat16}[args.mixed_precision]
    cfg, params = load_base_model(args.model, dtype=dtype,
                                  cache_dir=args.cache_dir)
    tokenizer = get_tokenizer(args.model, language=args.language)

    lora = None
    lora_scale = 1.0
    if args.checkpoint not in (None, "none"):
        ckpt = Path(args.checkpoint)
        adapter_dir = ckpt / "adapter" if (ckpt / "adapter").exists() else ckpt
        if not (adapter_dir / "adapter_config.json").exists():
            raise SystemExit(
                f"error: no adapter found at {ckpt} (expected "
                f"adapter_config.json in it or in an adapter/ subdir); "
                f"use --checkpoint none for the zero-shot base model")
        lora, lcfg, meta = lora_lib.load_any_adapter(adapter_dir, cfg)
        lora_scale = lcfg.scale
        logger.info("loaded adapter %s (r=%d, alpha=%d, meta=%s)",
                    adapter_dir, lcfg.r, lcfg.alpha, meta)

    ds = create_dataset(language=args.language, sources=args.data_sources,
                        split=args.split, tokenizer=tokenizer,
                        max_samples=args.max_samples, seed=args.seed,
                        model_config=cfg)
    loader = DataLoader(ds, args.batch_size,
                        create_collator(cfg.sot_token_id,
                                        num_mels=cfg.num_mel_bins,
                                        num_frames=cfg.num_audio_frames),
                        shuffle=False, drop_last=False)
    logger.info("evaluating %d samples (%s/%s)", len(ds), args.language,
                args.split)

    from sar_tpu.parallel.distributed import maybe_initialize_distributed
    from sar_tpu.parallel.sharding import mesh_from_flags
    maybe_initialize_distributed()
    mesh = mesh_from_flags(args.dp, args.tp, args.dcn_dp)
    if mesh is not None:
        logger.info("evaluating on mesh %s", mesh)
    evaluator = ASREvaluator(cfg, params, tokenizer, language=args.language,
                             max_new_tokens=args.max_new_tokens,
                             num_beams=args.num_beams, lora=lora,
                             lora_scale=lora_scale,
                             kv_int8=args.kv_cache == "int8",
                             kv_int4=args.kv_cache == "int4", mesh=mesh,
                             scores_int8=args.attn_scores == "int8",
                             fallback=args.fallback, task=args.task,
                             best_of=args.best_of)
    need_preds = args.save_predictions or args.per_sample
    results = evaluator.evaluate(loader, return_predictions=need_preds)

    print(f"WER: {results['wer'] * 100:.2f}%")
    print(f"CER: {results['cer'] * 100:.2f}%")
    print(f"Samples: {results['num_samples']}")

    if args.output_dir:
        to_save = results if args.save_predictions else {
            k: v for k, v in results.items()
            if k not in ("predictions", "references")}
        evaluator.save_results(to_save, args.output_dir)
        if args.per_sample:
            # Reuse the predictions already computed (no second decode pass).
            from sar_tpu.training.metrics import compute_metrics_per_sample
            per = compute_metrics_per_sample(results["predictions"],
                                             results["references"])
            for row, p, r in zip(per, results["predictions"],
                                 results["references"]):
                row["prediction"], row["reference"] = p, r
            (Path(args.output_dir) / "per_sample.json").write_text(
                json.dumps(per, indent=2, ensure_ascii=False))
        logger.info("wrote results to %s", args.output_dir)
    return results


if __name__ == "__main__":
    main()
