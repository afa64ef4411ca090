"""ASR LoRA trainer — the reference's training loop, compiled.

Capability parity with /root/reference/src/training/trainer.py (ASRTrainer):
step-based training to `max_steps`, an initial evaluation at step 0
(trainer.py:218-223), gradient accumulation, global-norm clipping, the
linear/cosine/constant warmup schedules, periodic evaluation with full greedy
generation + WER/CER, callback hooks, and best/periodic checkpointing.

TPU-first differences:
- the whole optimizer step — `grad_accum` microbatches scanned, gradients
  averaged, AdamW update — is ONE jitted, buffer-donated XLA program; the
  host loop only feeds batches and logs.
- mixed precision is bf16 compute with fp32 LoRA master weights (no loss
  scaler needed — the reference's fp16 GradScaler path, trainer.py:84-91,
  maps to bf16 on TPU).
- a training "step" is an optimizer update (scheduler-aligned).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sar_tpu.decode import greedy_decode, transcribe_tokens
from sar_tpu.models import lora as lora_lib
from sar_tpu.models import whisper
from sar_tpu.models.config import WhisperConfig
from sar_tpu.training import checkpoints
from sar_tpu.training.metrics import compute_metrics
from sar_tpu.training.optim import make_optimizer

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainingArgs:
    """Defaults mirror /root/reference/scripts/train_lora.py:32-110."""
    learning_rate: float = 5e-4
    weight_decay: float = 0.01
    warmup_steps: int = 500
    max_steps: int = 5000
    eval_steps: int = 1000
    scheduler: str = "linear"              # linear | cosine | constant
    mixed_precision: str = "bf16"          # bf16 | fp16 (-> bf16) | no
    gradient_accumulation_steps: int = 4
    max_grad_norm: float = 1.0
    max_new_tokens: int = 256
    gradient_checkpointing: bool = True
    # Blockwise Pallas attention (sar_tpu.ops.flash): "auto" = on for TPU
    # backends, off elsewhere (the kernel has no CPU build); "on"/"off" force.
    flash_attention: str = "auto"
    seed: int = 42

    def resolve_flash(self) -> bool:
        if self.flash_attention == "auto":
            return jax.default_backend() == "tpu"
        return self.flash_attention == "on"


class ASRTrainer:
    """Trains a LoRA adapter (bank) on a frozen Whisper base."""

    def __init__(self, model_cfg: WhisperConfig, base_params: dict,
                 lora: dict, lora_cfg: lora_lib.LoraConfig,
                 args: TrainingArgs | None = None, tokenizer=None,
                 language: str = "hindi", languages: list | None = None,
                 callbacks: list | None = None, mesh=None):
        self.cfg = model_cfg
        self.args = args or TrainingArgs()
        self.lora_cfg = lora_cfg
        self.tokenizer = tokenizer
        self.language = language
        # Bank-order language list for joint multilingual training; index i
        # of `languages` = adapter i = language_ids value i in batches.
        self.languages = list(languages) if languages else [language]
        self.callbacks = callbacks or []
        # Optional DPxTP device mesh (jax.sharding.Mesh with axes
        # "data"/"model"): base weights get tensor-parallel shardings, the
        # LoRA bank is replicated, batches shard over "data", and XLA GSPMD
        # inserts the ICI collectives. The reference's scale-out is a SLURM
        # array of independent single-GPU jobs (SURVEY.md §2.14); here one
        # training run spans the mesh.
        self.mesh = mesh

        compute = (jnp.bfloat16 if self.args.mixed_precision in ("bf16", "fp16")
                   else jnp.float32)
        self.compute_dtype = compute
        self.base_params = (whisper.cast_params(base_params, compute)
                            if compute != jnp.float32 else base_params)
        self.lora = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), lora)
        if mesh is not None:
            from sar_tpu.parallel.sharding import shard_lora, shard_params
            self.base_params = shard_params(self.base_params, mesh)
            self.lora = shard_lora(self.lora, mesh)

        self.tx, self.schedule = make_optimizer(
            learning_rate=self.args.learning_rate,
            weight_decay=self.args.weight_decay,
            warmup_steps=self.args.warmup_steps,
            max_steps=self.args.max_steps,
            scheduler=self.args.scheduler,
            max_grad_norm=self.args.max_grad_norm)
        self.opt_state = self.tx.init(self.lora)

        from sar_tpu.models.lora import num_adapters
        self.multi_adapter = num_adapters(self.lora) > 1

        self.global_step = 0
        self.epoch = 0
        self.best_metric: float | None = None
        # rbg keys: dropout masks are [B, T, d]-sized, and threefry bit
        # generation (plus its remat recompute in the backward) measured ~10%
        # of the whisper-small train step on v5e; rbg is much cheaper on TPU.
        self._rng = jax.random.key(self.args.seed, impl="rbg")
        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self):
        cfg, lora_cfg, args = self.cfg, self.lora_cfg, self.args
        dtype = self.compute_dtype

        multi = self.multi_adapter
        flash = args.resolve_flash()

        def loss_fn(lora, base_params, mel, labels, adapter_idx, rng):
            dec_in = whisper.shift_tokens_right(labels, cfg.sot_token_id,
                                                cfg.pad_token_id)
            logits = whisper.forward(
                base_params, mel.astype(dtype), dec_in, cfg, lora=lora,
                adapter_idx=adapter_idx if multi else None,
                lora_scale=lora_cfg.scale, lora_dropout=lora_cfg.dropout,
                dropout_rng=rng, remat=args.gradient_checkpointing,
                flash=flash)
            return whisper.cross_entropy_loss(logits, labels)

        def train_step(lora, opt_state, base_params, mels, labels,
                       adapter_ids, rng):
            """mels: [A, B, M, T]; labels: [A, B, L]; adapter_ids: [A, B]
            (per-utterance bank index for joint multilingual training — a
            capability the reference's one-job-per-language grid lacks) —
            A = accumulation."""
            A = mels.shape[0]
            rngs = jax.random.split(rng, A)

            def micro(carry, xs):
                g_acc, loss_acc = carry
                mel, lab, idx, r = xs
                loss, g = jax.value_and_grad(loss_fn)(lora, base_params,
                                                      mel, lab, idx, r)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, loss_acc + loss), None

            zeros = jax.tree.map(jnp.zeros_like, lora)
            (g, loss), _ = jax.lax.scan(micro, (zeros, 0.0),
                                        (mels, labels, adapter_ids, rngs))
            g = jax.tree.map(lambda x: x / A, g)
            updates, opt_state = self.tx.update(g, opt_state, lora)
            lora = jax.tree.map(
                lambda p, u: p + u.astype(p.dtype), lora, updates)
            gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(x))
                                 for x in jax.tree.leaves(g)))
            return lora, opt_state, loss / A, gnorm

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

        def eval_step(lora, base_params, mel, labels, prompt, adapter_idx):
            mel = mel.astype(dtype)
            idx = adapter_idx if multi else None
            enc_out = whisper.encode(base_params, mel, cfg, lora=lora,
                                     adapter_idx=idx,
                                     lora_scale=lora_cfg.scale, flash=flash)
            dec_in = whisper.shift_tokens_right(labels, cfg.sot_token_id,
                                                cfg.pad_token_id)
            logits = whisper.decode_train(base_params, enc_out, dec_in, cfg,
                                          lora=lora, adapter_idx=idx,
                                          lora_scale=lora_cfg.scale)
            loss = whisper.cross_entropy_loss(logits, labels)
            tokens = greedy_decode(base_params, enc_out, cfg, prompt,
                                   max_new_tokens=args.max_new_tokens,
                                   lora=lora, adapter_idx=idx,
                                   lora_scale=lora_cfg.scale)
            return loss, tokens

        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def _put(self, x, batch_axis: int):
        """Host batch array -> device, sharded over the mesh's batch axes
        ("data", plus "replica" on a multi-slice/DCN mesh). Under a
        multi-process runtime, `x` is this host's local shard and the result
        is the logically-global array (see distributed.put_global_batch)."""
        x = np.asarray(x)
        if self.mesh is None:
            return jnp.asarray(x)
        from sar_tpu.parallel.distributed import (n_batch_shards,
                                                  put_global_batch)
        n_data = n_batch_shards(self.mesh)
        if (x.shape[batch_axis] * jax.process_count()) % n_data:
            raise ValueError(
                f"batch axis {batch_axis} of shape {x.shape} not divisible "
                f"by the mesh's batch shards ({n_data}); pick batch_size as "
                f"a multiple of --dcn_dp x --dp")
        return put_global_batch(x, self.mesh, batch_axis)

    # ------------------------------------------------------------------
    def train(self, train_loader, eval_loader=None) -> dict:
        args = self.args
        for cb in self.callbacks:
            cb.on_train_begin(self)

        history: dict[str, Any] = {"loss": [], "eval": []}
        if eval_loader is not None:
            metrics = self.evaluate(eval_loader)
            history["eval"].append({"step": self.global_step, **metrics})

        batch_iter = train_loader.iterate()
        accum = args.gradient_accumulation_steps
        t0 = time.time()
        for cb in self.callbacks:
            cb.on_epoch_begin(self, self.epoch)
        while self.global_step < args.max_steps:
            loader_epoch = getattr(train_loader, "current_epoch", 0)
            if loader_epoch != self.epoch:
                for cb in self.callbacks:
                    cb.on_epoch_end(self, self.epoch)
                self.epoch = loader_epoch
                for cb in self.callbacks:
                    cb.on_epoch_begin(self, self.epoch)
            for cb in self.callbacks:
                cb.on_step_begin(self, self.global_step)
            micro = [next(batch_iter) for _ in range(accum)]
            # Batch axis is axis 1 (axis 0 is the accumulation scan).
            mels = self._put(np.stack([b["input_features"] for b in micro]), 1)
            # Bucketing collators (pad_to_multiple) may yield different label
            # widths per microbatch; pad the accumulation group to its max.
            width = max(b["labels"].shape[1] for b in micro)
            labels = self._put(np.stack([
                np.pad(b["labels"], [(0, 0), (0, width - b["labels"].shape[1])],
                       constant_values=-100) for b in micro]), 1)
            adapter_ids = self._put(np.stack(
                [b.get("language_ids", np.zeros(len(b["texts"]), np.int32))
                 for b in micro]), 1)
            self._rng, step_rng = jax.random.split(self._rng)
            self.lora, self.opt_state, loss, gnorm = self._train_step(
                self.lora, self.opt_state, self.base_params, mels, labels,
                adapter_ids, step_rng)
            self.global_step += 1
            logs = {"loss": float(loss),
                    "learning_rate": float(self.schedule(self.global_step)),
                    "grad_norm": float(gnorm)}
            history["loss"].append(logs["loss"])
            for cb in self.callbacks:
                cb.on_step_end(self, self.global_step, logs)
            if self.global_step % 50 == 0 or self.global_step == 1:
                rate = self.global_step / (time.time() - t0)
                logger.info("step %d/%d loss=%.4f lr=%.2e (%.2f steps/s)",
                            self.global_step, args.max_steps, logs["loss"],
                            logs["learning_rate"], rate)

            if eval_loader is not None and args.eval_steps \
                    and self.global_step % args.eval_steps == 0:
                metrics = self.evaluate(eval_loader)
                history["eval"].append({"step": self.global_step, **metrics})
                if any(getattr(cb, "should_stop", False) for cb in self.callbacks):
                    logger.info("early stop at step %d", self.global_step)
                    break

        for cb in self.callbacks:
            cb.on_epoch_end(self, self.epoch)
            cb.on_train_end(self)
        return history

    # ------------------------------------------------------------------
    def evaluate(self, eval_loader) -> dict:
        for cb in self.callbacks:
            cb.on_evaluate_begin(self)
        prompt_table = jnp.asarray(
            [self.cfg.prompt_ids(l) for l in self.languages], jnp.int32)
        losses, preds, refs = [], [], []
        for batch in eval_loader.one_epoch():
            B = len(batch["texts"])
            mels = np.asarray(batch["input_features"])
            labels = np.asarray(batch["labels"])
            ids_np = np.asarray(batch.get(
                "language_ids", np.zeros(B, np.int32)), np.int32)
            # Pad partial batches up to the loader's full batch size so a
            # ragged final batch never changes B and retraces _eval_step (a
            # full decode-loop compile). Padded rows carry all -100 labels
            # (zero loss-mask weight) and are sliced off below. A full batch
            # size also satisfies the mesh's batch-shard divisibility (full
            # batches already must divide it to run at all).
            target = max(getattr(eval_loader, "batch_size", B), B)
            if self.mesh is not None:
                from sar_tpu.parallel.distributed import n_batch_shards
                n_data = n_batch_shards(self.mesh)
                target += (-target) % n_data
            pad = target - B
            if pad:
                mels = np.pad(mels, [(0, pad)] + [(0, 0)] * (mels.ndim - 1))
                labels = np.pad(labels, [(0, pad), (0, 0)],
                                constant_values=-100)
                ids_np = np.pad(ids_np, (0, pad))
            ids = self._put(ids_np, 0)
            prompt = (prompt_table[ids] if self.multi_adapter
                      else prompt_table[0])
            loss, tokens = self._eval_step(
                self.lora, self.base_params, self._put(mels, 0),
                self._put(labels, 0), prompt, ids)
            tokens = tokens[:B]
            losses.append(float(loss))
            plen = int(prompt_table.shape[1])
            rows = transcribe_tokens(tokens, self.cfg, prompt_len=plen)
            if self.tokenizer is not None:
                preds.extend(self.tokenizer.decode(row) for row in rows)
                refs.extend(batch["texts"])
        metrics = {"eval_loss": float(np.mean(losses)) if losses else float("nan"),
                   "num_samples": len(refs)}
        if preds:
            metrics.update(compute_metrics(preds, refs))
        logger.info("eval @ step %d: %s", self.global_step,
                    {k: (round(v, 4) if isinstance(v, float) else v)
                     for k, v in metrics.items()})
        for cb in self.callbacks:
            cb.on_evaluate_end(self, metrics)
        return metrics

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str | Path) -> None:
        checkpoints.save_checkpoint(
            path, self.lora, self.lora_cfg, self.opt_state,
            self.global_step, self.epoch, self.best_metric,
            metadata={"language": self.language, "model": self.cfg.name})

    def load_checkpoint(self, path: str | Path) -> None:
        (self.lora, self.lora_cfg, _, self.opt_state, self.global_step,
         self.epoch, self.best_metric) = checkpoints.load_checkpoint(
            path, self.tx.init(self.lora))
        self._build_steps()
