#!/usr/bin/env python
"""Train the Phase-2 LID classifier on frozen Whisper encoder features.

CLI parity with /root/reference/scripts/train_router.py:560-683 (same flags
and defaults: encoder_layer, pooling, use_cnn, hidden_dims, label_smoothing,
samples_per_language, balanced/no_balanced + class-weight strategies with
max/smoothing, max_duration=15, batch 32, lr 1e-3, steps 2000, warmup 100,
eval 200, cosine). The balancing-vs-class-weights interplay matches
train_router.py:787-820: class weights disable undersampling unless
balancing is forced.
"""

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("train_router")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train LID classifier (TPU)")
    p.add_argument("--base_model", type=str, default="whisper-small",
                   choices=["whisper-tiny", "whisper-base", "whisper-small",
                            "whisper-medium", "whisper-large", "whisper-test"])
    p.add_argument("--encoder_layer", type=int, default=-1)
    # Classifier
    p.add_argument("--hidden_dims", type=int, nargs="+", default=[256, 128])
    p.add_argument("--dropout", type=float, default=0.3)
    p.add_argument("--pooling", type=str, default="mean",
                   choices=["mean", "max", "attention"])
    p.add_argument("--use_cnn", action="store_true")
    p.add_argument("--label_smoothing", type=float, default=0.1)
    # Data
    p.add_argument("--languages", type=str, nargs="+",
                   default=["hindi", "italian", "punjabi", "telugu"])
    p.add_argument("--data_sources", type=str, nargs="+",
                   default=["common_voice"])
    p.add_argument("--samples_per_language", type=int, default=5000)
    p.add_argument("--balanced", action="store_true", default=True)
    p.add_argument("--no_balanced", action="store_true")
    p.add_argument("--class_weights", type=str, default="none",
                   choices=["none", "inverse_freq", "inverse_sqrt",
                            "effective_samples"])
    p.add_argument("--class_weight_max", type=float, default=10.0)
    p.add_argument("--class_weight_smoothing", type=float, default=0.0)
    p.add_argument("--max_duration", type=float, default=15.0)
    p.add_argument("--min_duration", type=float, default=1.0)
    # Training
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--max_steps", type=int, default=2000)
    p.add_argument("--eval_steps", type=int, default=200)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--scheduler_type", type=str, default="cosine")
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["no", "fp16", "bf16"])
    # Output / misc
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--wandb_project", type=str, default="lid-classifier")
    p.add_argument("--wandb_run_name", type=str, default=None)
    p.add_argument("--no_wandb", action="store_true")
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cache_features", action="store_true",
                   help="Precompute the frozen-encoder features once and "
                        "train the head on the device-resident cache (the "
                        "encoder never trains, so its outputs are constant; "
                        "the reference re-extracts them every step). "
                        "Single-host; cache is [N, T_enc, d_model] bf16 in "
                        "HBM — size the corpus accordingly")
    p.add_argument("--resume_from", type=str, default=None,
                   help="Checkpoint dir (train_router.py output or its "
                        "classifier/ subdir) to resume from")
    # Parallelism (same mesh flags as train_lora/evaluate_model: the LID
    # step is dominated by the frozen encoder forward, which shards the
    # same way).
    p.add_argument("--dp", type=int, default=1,
                   help="Data-parallel mesh axis (batch shards over it)")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel mesh axis for the frozen encoder")
    p.add_argument("--dcn_dp", type=int, default=1,
                   help="Data parallelism across slices/hosts over DCN")
    p.add_argument("--platform", type=str, default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="Pin the jax platform (cpu + "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                        "gives an N-device virtual mesh)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from sar_tpu.data.collate import LIDCollator
    from sar_tpu.data.datasets import create_dataset
    from sar_tpu.data.loader import DataLoader
    from sar_tpu.data.tokenizer import get_tokenizer
    from sar_tpu.models import classifier as clf
    from sar_tpu.models.base import load_base_model
    from sar_tpu.training import WandbCallback
    from sar_tpu.training.lid_trainer import (LIDDataset, LIDTrainer,
                                              LIDTrainingArgs)

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "config.yaml").write_text(
        "\n".join(f"{k}: {json.dumps(v)}" for k, v in sorted(vars(args).items()))
        + "\n")

    dtype = {"no": jnp.float32, "fp16": jnp.bfloat16,
             "bf16": jnp.bfloat16}[args.mixed_precision]
    cfg, params = load_base_model(args.base_model, dtype=dtype,
                                  cache_dir=args.cache_dir)
    tokenizer = get_tokenizer(args.base_model)

    def build(split):
        return {
            lang: create_dataset(
                language=lang, sources=args.data_sources, split=split,
                tokenizer=tokenizer, language_id=i,
                min_duration=args.min_duration, max_duration=args.max_duration,
                seed=args.seed, model_config=cfg)
            for i, lang in enumerate(args.languages)
        }

    # Balancing-vs-class-weights interplay (train_router.py:787-820):
    # explicit class weights disable undersampling unless forced.
    use_weights = args.class_weights != "none"
    balance = args.balanced and not args.no_balanced and not use_weights

    train_lid = LIDDataset(build("train"), args.languages,
                           samples_per_language=args.samples_per_language,
                           balance=balance, seed=args.seed)
    val_lid = LIDDataset(build("validation"), args.languages,
                         samples_per_language=max(args.samples_per_language // 10, 1),
                         balance=False, seed=args.seed)

    class_weights = None
    if use_weights:
        w = clf.compute_class_weights_from_counts(
            train_lid.class_counts, args.languages,
            strategy=args.class_weights, max_weight=args.class_weight_max,
            smoothing=args.class_weight_smoothing)
        class_weights = tuple(float(x) for x in w)
        logger.info("class weights: %s",
                    dict(zip(args.languages, class_weights)))

    ccfg = clf.ClassifierConfig(
        input_dim=cfg.d_model, hidden_dims=tuple(args.hidden_dims),
        num_classes=len(args.languages), dropout=args.dropout,
        pooling=args.pooling, use_cnn=args.use_cnn,
        label_smoothing=args.label_smoothing,
        languages=tuple(args.languages), class_weights=class_weights,
        encoder_layer=args.encoder_layer)
    clf_params = clf.init_classifier(jax.random.PRNGKey(args.seed), ccfg)

    coll = LIDCollator(num_mels=cfg.num_mel_bins,
                       num_frames=cfg.num_audio_frames)
    train_loader = DataLoader(train_lid, args.batch_size, coll, seed=args.seed)
    eval_loader = DataLoader(val_lid, args.batch_size, coll, shuffle=False,
                             drop_last=False)

    callbacks = []
    if not args.no_wandb:
        callbacks.append(WandbCallback(project=args.wandb_project,
                                       name=args.wandb_run_name,
                                       config=vars(args)))

    targs = LIDTrainingArgs(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps, max_steps=args.max_steps,
        eval_steps=args.eval_steps, scheduler=args.scheduler_type,
        mixed_precision=args.mixed_precision,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        encoder_layer=args.encoder_layer, seed=args.seed)
    from sar_tpu.parallel.distributed import maybe_initialize_distributed
    from sar_tpu.parallel.sharding import mesh_from_flags
    maybe_initialize_distributed()
    mesh = mesh_from_flags(args.dp, args.tp, args.dcn_dp)
    if mesh is not None:
        logger.info("LID training on mesh %s", mesh)
    trainer = LIDTrainer(cfg, params, clf_params, ccfg, targs,
                         callbacks=callbacks, mesh=mesh)
    if args.resume_from:
        trainer.load_checkpoint(args.resume_from)
        logger.info("resumed from %s at step %d", args.resume_from,
                    trainer.global_step)
    if args.cache_features:
        if mesh is not None:
            raise SystemExit("--cache_features is a single-host fast path; "
                             "drop it when training on a mesh")
        logger.info("precomputing frozen-encoder features (layer %d) ...",
                    args.encoder_layer)
        tr_feats, tr_labels = trainer.precompute_features(train_loader)
        ev_feats, ev_labels = trainer.precompute_features(eval_loader)
        logger.info("cached %d train / %d eval feature rows on device",
                    tr_feats.shape[0], ev_feats.shape[0])
        history = trainer.train_cached(tr_feats, tr_labels,
                                       batch_size=args.batch_size,
                                       eval_feats=ev_feats,
                                       eval_labels=ev_labels)
    else:
        history = trainer.train(train_loader, eval_loader)

    trainer.save_checkpoint(out / "classifier")
    (out / "history.json").write_text(json.dumps(
        {"loss": history["loss"][-50:], "eval": history["eval"]}, indent=2))
    final = history["eval"][-1] if history["eval"] else {}
    logger.info("done; accuracy=%.4f -> %s", final.get("accuracy", float("nan")),
                out / "classifier")
    return history


if __name__ == "__main__":
    main()
