#!/usr/bin/env python
"""Train a per-language LoRA adapter on Whisper (Phase 1).

CLI parity with /root/reference/scripts/train_lora.py:32-110 (same flags and
defaults), plus `--model whisper-test` + `--data_sources synthetic` for the
hermetic no-network path. The run config is dumped to output_dir/config.yaml
(parity with train_lora.py:137-139); the best-WER adapter checkpoint and a
`final/` adapter are written under --output_dir.
"""

import argparse
import json
import logging
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("train_lora")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train LoRA adapters for ASR (TPU)")
    p.add_argument("--model", type=str, default="whisper-small",
                   choices=["whisper-tiny", "whisper-base", "whisper-small",
                            "whisper-medium", "whisper-large", "whisper-test"])
    p.add_argument("--language", type=str, required=True,
                   choices=["hindi", "italian", "punjabi", "telugu",
                            "english", "german", "french", "spanish"])
    # LoRA
    p.add_argument("--lora_rank", type=int, default=16)
    p.add_argument("--lora_alpha", type=int, default=32)
    p.add_argument("--lora_dropout", type=float, default=0.1)
    p.add_argument("--target_modules", type=str, nargs="+",
                   default=["q_proj", "v_proj"])
    # Data
    p.add_argument("--data_sources", type=str, nargs="+",
                   default=["common_voice"])
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--max_duration", type=float, default=30.0)
    p.add_argument("--min_duration", type=float, default=1.0)
    p.add_argument("--max_label_length", type=int, default=448,
                   help="Static label pad length for jitted steps")
    # Training
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--max_steps", type=int, default=5000)
    p.add_argument("--eval_steps", type=int, default=1000)
    p.add_argument("--scheduler_type", type=str, default="linear")
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["no", "fp16", "bf16"])
    p.add_argument("--max_new_tokens", type=int, default=256)
    # Parallelism (TPU mesh; the reference scales out via a SLURM array of
    # independent jobs — SURVEY.md §2.14)
    p.add_argument("--dp", type=int, default=1,
                   help="Data-parallel mesh axis (batch shards over it)")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel mesh axis (attention heads / FFN "
                        "shard over it)")
    p.add_argument("--dcn_dp", type=int, default=1,
                   help="Data-parallel replicas over DCN (multi-slice/multi-host;\n"
                        "adds a leading 'replica' mesh axis)")
    p.add_argument("--num_workers", type=int, default=0,
                   help="Dataloader prefetch workers (reference ran 4)")
    p.add_argument("--platform", type=str, default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="Pin the jax platform (cpu + "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                        "gives an N-device virtual mesh)")
    p.add_argument("--flash_attention", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="Blockwise Pallas attention (auto = on for TPU)")
    # Output
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--save_total_limit", type=int, default=3)
    # W&B
    p.add_argument("--wandb_project", type=str, default="whisper-lora-adapters")
    p.add_argument("--wandb_run_name", type=str, default=None)
    p.add_argument("--no_wandb", action="store_true")
    # Other
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--early_stopping_patience", type=int, default=5)
    p.add_argument("--resume_from", type=str, default=None)
    return p.parse_args(argv)


def set_seed(seed: int):
    """Parity with train_lora.py:113-122."""
    random.seed(seed)
    np.random.seed(seed)


def main(argv=None):
    args = parse_args(argv)
    set_seed(args.seed)

    import jax
    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from sar_tpu.data.collate import create_collator
    from sar_tpu.data.datasets import create_dataset
    from sar_tpu.data.loader import DataLoader
    from sar_tpu.data.tokenizer import get_tokenizer
    from sar_tpu.models import lora as lora_lib
    from sar_tpu.models.base import load_base_model
    from sar_tpu.training import (ASRTrainer, CheckpointCallback,
                                  EarlyStoppingCallback, TrainingArgs,
                                  WandbCallback)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "config.yaml").write_text(
        "\n".join(f"{k}: {json.dumps(v)}" for k, v in sorted(vars(args).items()))
        + "\n")

    dtype = {"no": jnp.float32, "fp16": jnp.bfloat16,
             "bf16": jnp.bfloat16}[args.mixed_precision]
    cfg, params = load_base_model(args.model, dtype=dtype,
                                  cache_dir=args.cache_dir)
    tokenizer = get_tokenizer(args.model, language=args.language)

    lcfg = lora_lib.LoraConfig(r=args.lora_rank, alpha=args.lora_alpha,
                               dropout=args.lora_dropout,
                               target_modules=tuple(args.target_modules))
    bank = lora_lib.init_lora(jax.random.PRNGKey(args.seed), cfg, lcfg)
    logger.info("trainable: %s", lora_lib.trainable_summary(bank, params))

    common = dict(language=args.language, sources=args.data_sources,
                  tokenizer=tokenizer, min_duration=args.min_duration,
                  max_duration=args.max_duration, seed=args.seed,
                  model_config=cfg)
    train_ds = create_dataset(split="train", max_samples=args.max_samples,
                              **common)
    val_cap = args.max_samples // 10 if args.max_samples else None
    val_ds = create_dataset(split="validation", max_samples=val_cap, **common)
    logger.info("train=%d validation=%d samples", len(train_ds), len(val_ds))

    coll = create_collator(cfg.sot_token_id, pad_to_length=args.max_label_length,
                           num_mels=cfg.num_mel_bins,
                                        num_frames=cfg.num_audio_frames)
    train_loader = DataLoader(train_ds, args.batch_size, coll, seed=args.seed,
                              num_workers=args.num_workers)
    eval_loader = DataLoader(val_ds, args.batch_size, coll, shuffle=False,
                             drop_last=False, num_workers=args.num_workers)

    callbacks = [
        CheckpointCallback(out, save_steps=args.save_steps,
                           save_total_limit=args.save_total_limit),
        EarlyStoppingCallback(patience=args.early_stopping_patience),
    ]
    if not args.no_wandb:
        callbacks.insert(0, WandbCallback(project=args.wandb_project,
                                          name=args.wandb_run_name,
                                          config=vars(args)))

    targs = TrainingArgs(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps, max_steps=args.max_steps,
        eval_steps=args.eval_steps, scheduler=args.scheduler_type,
        mixed_precision=args.mixed_precision,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        max_new_tokens=args.max_new_tokens,
        flash_attention=args.flash_attention, seed=args.seed)
    from sar_tpu.parallel.distributed import maybe_initialize_distributed
    from sar_tpu.parallel.sharding import mesh_from_flags
    maybe_initialize_distributed()
    mesh = mesh_from_flags(args.dp, args.tp, args.dcn_dp)
    if mesh is not None:
        logger.info("training on mesh %s", mesh)
    trainer = ASRTrainer(cfg, params, bank, lcfg, targs, tokenizer=tokenizer,
                         language=args.language, callbacks=callbacks,
                         mesh=mesh)
    if args.resume_from:
        trainer.load_checkpoint(args.resume_from)
        logger.info("resumed from %s at step %d", args.resume_from,
                    trainer.global_step)

    history = trainer.train(train_loader, eval_loader)

    from sar_tpu.models.lora import save_adapter
    save_adapter(out / "final", trainer.lora, lcfg,
                 metadata={"language": args.language, "model": args.model,
                           "global_step": trainer.global_step})
    (out / "history.json").write_text(json.dumps(
        {"loss": history["loss"][-50:], "eval": history["eval"]}, indent=2))
    logger.info("done; final adapter at %s", out / "final")
    return history


if __name__ == "__main__":
    main()
