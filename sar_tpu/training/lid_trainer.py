"""LID (language-identification) classifier trainer — Phase 2.

Capability parity with the self-contained trainer in
/root/reference/scripts/train_router.py:
- LIDDataset: per-language ASR datasets -> (features, class label) samples,
  with per-language caps and undersample-to-min balancing (:100-123), class
  distribution logging
- LIDTrainer (:176-550): AdamW + warmup/cosine, gradient accumulation,
  classifier-only params; each step runs the FROZEN encoder then the
  classifier (:436-454); eval computes accuracy, per-class accuracy, and a
  confusion matrix (:456-531); checkpointing (:533-550)

TPU-first: the frozen-encoder + classifier step (including accumulation) is
one jitted program; the encoder runs in bf16 under stop_gradient.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sar_tpu.models import classifier as clf
from sar_tpu.models import whisper
from sar_tpu.models.config import WhisperConfig
from sar_tpu.training.optim import make_optimizer

logger = logging.getLogger(__name__)


class LIDDataset:
    """Combine per-language datasets into (features, label) samples.

    `datasets` maps language name -> list-like ASR dataset (items must carry
    "input_features"). Parity with train_router.py:40-148.
    """

    def __init__(self, datasets: dict[str, object],
                 languages: list[str] | tuple[str, ...],
                 samples_per_language: int | None = None,
                 balance: bool = False, seed: int = 42):
        self.languages = list(languages)
        rng = np.random.default_rng(seed)
        per_lang: dict[str, list[int]] = {}
        for lang in self.languages:
            ds = datasets[lang]
            idx = np.arange(len(ds))
            rng.shuffle(idx)
            if samples_per_language is not None:
                idx = idx[:samples_per_language]
            per_lang[lang] = idx.tolist()
        if balance:
            n_min = min(len(v) for v in per_lang.values())
            per_lang = {k: v[:n_min] for k, v in per_lang.items()}

        self._entries: list[tuple[str, int, int]] = []
        for li, lang in enumerate(self.languages):
            for i in per_lang[lang]:
                self._entries.append((lang, i, li))
        self._datasets = datasets
        self.class_counts = {lang: len(per_lang[lang]) for lang in self.languages}
        logger.info("LID dataset class distribution: %s", self.class_counts)

    def __len__(self):
        return len(self._entries)

    def __getitem__(self, i):
        lang, j, li = self._entries[i]
        item = self._datasets[lang][j]
        return {"input_features": item["input_features"], "language_id": li}


@dataclasses.dataclass
class LIDTrainingArgs:
    """Defaults mirror /root/reference/scripts/train_router.py:692-883."""
    learning_rate: float = 1e-3
    weight_decay: float = 0.01
    warmup_steps: int = 100
    max_steps: int = 2000
    eval_steps: int = 200
    scheduler: str = "cosine"
    mixed_precision: str = "bf16"
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    encoder_layer: int = -1          # which encoder layer to tap (--encoder_layer)
    seed: int = 42


class LIDTrainer:
    def __init__(self, model_cfg: WhisperConfig, base_params: dict,
                 clf_params: dict, clf_cfg: clf.ClassifierConfig,
                 args: LIDTrainingArgs | None = None,
                 callbacks: list | None = None, mesh=None):
        self.cfg = model_cfg
        self.clf_cfg = clf_cfg
        self.args = args or LIDTrainingArgs()
        if clf_cfg.encoder_layer != self.args.encoder_layer:
            raise ValueError(
                f"ClassifierConfig.encoder_layer={clf_cfg.encoder_layer} != "
                f"LIDTrainingArgs.encoder_layer={self.args.encoder_layer}; "
                "the tap layer is saved with the classifier so inference "
                "extracts the features the head was trained on — set both "
                "to the same value")
        self.callbacks = callbacks or []
        # Optional device mesh: the LID step's cost is dominated by the
        # FROZEN encoder forward, so the same DPxTP sharding as ASRTrainer
        # applies — base weights tensor-parallel, the (small) classifier
        # head replicated, batches over the data axes.
        self.mesh = mesh
        compute = (jnp.bfloat16 if self.args.mixed_precision in ("bf16", "fp16")
                   else jnp.float32)
        self.base_params = (whisper.cast_params(base_params, compute)
                            if compute != jnp.float32 else base_params)
        self.params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                                   clf_params)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from sar_tpu.parallel.sharding import shard_params
            self.base_params = shard_params(self.base_params, mesh)
            self.params = jax.device_put(self.params,
                                         NamedSharding(mesh, P()))
        self.tx, self.schedule = make_optimizer(
            learning_rate=self.args.learning_rate,
            weight_decay=self.args.weight_decay,
            warmup_steps=self.args.warmup_steps,
            max_steps=self.args.max_steps,
            scheduler=self.args.scheduler,
            max_grad_norm=self.args.max_grad_norm)
        self.opt_state = self.tx.init(self.params)
        self.global_step = 0
        self.best_metric: float | None = None
        self._rng = jax.random.PRNGKey(self.args.seed)
        self._build_steps()

    def _build_steps(self):
        cfg, ccfg, args = self.cfg, self.clf_cfg, self.args
        # hm encoder kernel on a single TPU chip; exact jnp attention under
        # a mesh (no SPMD rule) or on CPU. Value-only through stop_gradient,
        # so the kernel's missing VJP is irrelevant here.
        flash = ("hm" if self.mesh is None
                 and jax.default_backend() == "tpu" else False)

        def features(base_params, mel):
            return clf.encode_features(base_params, mel, cfg,
                                       layer_index=args.encoder_layer,
                                       flash=flash)

        def loss_fn(params, base_params, mel, labels, rng):
            feats = features(base_params, mel)
            out = clf.apply_classifier(params, ccfg, feats, labels=labels,
                                       train=True, rng=rng)
            return out["loss"]

        def train_step(params, opt_state, base_params, mels, labels, rng):
            A = mels.shape[0]
            rngs = jax.random.split(rng, A)

            def micro(carry, xs):
                g_acc, loss_acc = carry
                mel, lab, r = xs
                loss, g = jax.value_and_grad(loss_fn)(params, base_params,
                                                      mel, lab, r)
                return (jax.tree.map(jnp.add, g_acc, g), loss_acc + loss), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            (g, loss), _ = jax.lax.scan(micro, (zeros, 0.0), (mels, labels, rngs))
            g = jax.tree.map(lambda x: x / A, g)
            updates, opt_state = self.tx.update(g, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  params, updates)
            return params, opt_state, loss / A

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

        def eval_step(params, base_params, mel, labels):
            feats = features(base_params, mel)
            out = clf.apply_classifier(params, ccfg, feats, labels=labels)
            preds = jnp.argmax(out["logits"], axis=-1)
            return out["loss"], preds

        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def _put(self, x, batch_axis: int):
        """Host batch -> device, sharded over the mesh's batch axes (same
        contract as ASRTrainer._put)."""
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
        history: dict = {"loss": [], "eval": []}
        if eval_loader is not None:
            history["eval"].append(
                {"step": 0, **self.evaluate(eval_loader)})
        it = train_loader.iterate()
        t0 = time.time()
        while self.global_step < args.max_steps:
            micro = [next(it) for _ in range(args.gradient_accumulation_steps)]
            # Batch axis is 1 (axis 0 is the accumulation scan).
            mels = self._put(np.stack([b["input_features"] for b in micro]), 1)
            labels = self._put(np.stack([b["language_ids"] for b in micro]), 1)
            self._rng, r = jax.random.split(self._rng)
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, self.base_params, mels, labels, r)
            self.global_step += 1
            logs = {"loss": float(loss),
                    "learning_rate": float(self.schedule(self.global_step))}
            history["loss"].append(logs["loss"])
            for cb in self.callbacks:
                cb.on_step_end(self, self.global_step, logs)
            if self.global_step % 50 == 0 or self.global_step == 1:
                logger.info("LID step %d/%d loss=%.4f (%.2f steps/s)",
                            self.global_step, args.max_steps, logs["loss"],
                            self.global_step / (time.time() - t0))
            if eval_loader is not None and args.eval_steps \
                    and self.global_step % args.eval_steps == 0:
                history["eval"].append(
                    {"step": self.global_step, **self.evaluate(eval_loader)})
                if any(getattr(cb, "should_stop", False) for cb in self.callbacks):
                    break
        for cb in self.callbacks:
            cb.on_train_end(self)
        return history

    # ------------------------------------------------------------------
    # Frozen-encoder feature caching. The encoder never trains (it runs
    # under stop_gradient — the reference extracts features with
    # torch.no_grad() every step, /root/reference/scripts/train_router.py:
    # 436-454), so its outputs per sample are CONSTANT across the whole run.
    # Precompute them once per tap layer, keep them device-resident, and
    # train the head on indexed slices: no per-step mel transfer, no
    # repeated encoder FLOPs. At whisper-small a cached head step is ~100x
    # cheaper than a streaming one. Opt-in (scripts/train_router.py
    # --cache_features): the cache is [N, T_enc, d_model] bf16 on device
    # (~2.3 MB/sample at whisper-small), so it fits HBM only for
    # head-training-scale corpora. Single-host path (mesh=None).
    def precompute_features(self, loader):
        """Run the frozen encoder once over `loader` -> (feats, labels) on
        device. Features depend on encoder_layer but NOT on pooling, so one
        cache serves every head architecture at that tap."""
        if self.mesh is not None:
            raise NotImplementedError(
                "feature caching is a single-host fast path; under a mesh "
                "use the streaming train() (encoder cost is sharded there)")
        flash = "hm" if jax.default_backend() == "tpu" else False
        fn = jax.jit(lambda bp, mel: clf.encode_features(
            bp, mel, self.cfg, layer_index=self.args.encoder_layer,
            flash=flash))
        feats, labels = [], []
        for batch in loader.one_epoch():
            mel = jnp.asarray(np.asarray(batch["input_features"]))
            feats.append(fn(self.base_params, mel))
            labels.append(np.asarray(batch["language_ids"]))
        return (jnp.concatenate(feats, axis=0),
                jnp.asarray(np.concatenate(labels), jnp.int32))

    def train_cached(self, feats, labels, batch_size: int = 32,
                     eval_feats=None, eval_labels=None) -> dict:
        """train(), but over a device-resident feature cache from
        precompute_features(). Semantics match the streaming path with
        gradient_accumulation_steps=1 (the head is a few matmuls — there is
        nothing to accumulate over); epochs are host-side permutations, and
        only [B] int32 index vectors cross to the device per step."""
        args, ccfg = self.args, self.clf_cfg

        def step(params, opt_state, feats, labels, idx, rng):
            mb = jnp.take(feats, idx, axis=0)
            lb = jnp.take(labels, idx, axis=0)

            def loss_fn(p):
                return clf.apply_classifier(p, ccfg, mb, labels=lb,
                                            train=True, rng=rng)["loss"]

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(g, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  params, updates)
            return params, opt_state, loss

        step_j = jax.jit(step, donate_argnums=(0, 1))
        n = int(feats.shape[0])
        rng_np = np.random.default_rng(args.seed)
        perm: list[int] = []
        for cb in self.callbacks:
            cb.on_train_begin(self)
        history: dict = {"loss": [], "eval": []}
        if eval_feats is not None:
            history["eval"].append(
                {"step": 0, **self.evaluate_cached(eval_feats, eval_labels)})
        t0 = time.time()
        while self.global_step < args.max_steps:
            if len(perm) < batch_size:
                perm.extend(rng_np.permutation(n).tolist())
            idx = jnp.asarray(np.asarray(perm[:batch_size], np.int32))
            del perm[:batch_size]
            self._rng, r = jax.random.split(self._rng)
            self.params, self.opt_state, loss = step_j(
                self.params, self.opt_state, feats, labels, idx, r)
            self.global_step += 1
            logs = {"loss": float(loss),
                    "learning_rate": float(self.schedule(self.global_step))}
            history["loss"].append(logs["loss"])
            for cb in self.callbacks:
                cb.on_step_end(self, self.global_step, logs)
            if self.global_step % 100 == 0 or self.global_step == 1:
                logger.info("LID step %d/%d loss=%.4f (%.1f steps/s, cached)",
                            self.global_step, args.max_steps, logs["loss"],
                            self.global_step / (time.time() - t0))
            if eval_feats is not None and args.eval_steps \
                    and self.global_step % args.eval_steps == 0:
                history["eval"].append(
                    {"step": self.global_step,
                     **self.evaluate_cached(eval_feats, eval_labels)})
                if any(getattr(cb, "should_stop", False)
                       for cb in self.callbacks):
                    break
        for cb in self.callbacks:
            cb.on_train_end(self)
        return history

    def evaluate_cached(self, feats, labels, batch_size: int = 64) -> dict:
        """evaluate() over a device-resident feature cache."""
        ccfg = self.clf_cfg
        if not hasattr(self, "_eval_cached_step"):
            def eval_step(params, fb, lb):
                out = clf.apply_classifier(params, ccfg, fb, labels=lb)
                return out["loss"], jnp.argmax(out["logits"], axis=-1)
            self._eval_cached_step = jax.jit(eval_step)
        for cb in self.callbacks:
            cb.on_evaluate_begin(self)
        n = int(feats.shape[0])
        labels_np = np.asarray(labels)
        confusion = np.zeros((ccfg.num_classes, ccfg.num_classes), np.int64)
        losses = []
        for s in range(0, n, batch_size):
            e = min(s + batch_size, n)
            loss, preds = self._eval_cached_step(
                self.params, feats[s:e], labels[s:e])
            losses.append(float(loss))
            for t, p in zip(labels_np[s:e], np.asarray(preds)):
                confusion[int(t), int(p)] += 1
        metrics = self._lid_metrics(confusion, losses)
        for cb in self.callbacks:
            cb.on_evaluate_end(self, metrics)
        return metrics

    def _lid_metrics(self, confusion: np.ndarray, losses: list) -> dict:
        total = confusion.sum()
        acc = float(np.trace(confusion)) / max(total, 1)
        per_class = {}
        for i, lang in enumerate(self.clf_cfg.languages):
            n = confusion[i].sum()
            per_class[lang] = float(confusion[i, i]) / max(n, 1)
        metrics = {"eval_loss": float(np.mean(losses)) if losses else float("nan"),
                   "accuracy": acc, "per_class_accuracy": per_class,
                   "confusion_matrix": confusion.tolist(),
                   "num_samples": int(total)}
        logger.info("LID eval @ %d: acc=%.4f per-class=%s",
                    self.global_step, round(acc, 4),
                    {k: round(v, 3) for k, v in per_class.items()})
        return metrics

    # ------------------------------------------------------------------
    def evaluate(self, eval_loader) -> dict:
        """Accuracy, per-class accuracy, confusion matrix
        (parity with train_router.py:456-531)."""
        for cb in self.callbacks:
            cb.on_evaluate_begin(self)
        K = self.clf_cfg.num_classes
        confusion = np.zeros((K, K), np.int64)
        losses = []
        for batch in eval_loader.one_epoch():
            mels = np.asarray(batch["input_features"])
            labels = np.asarray(batch["language_ids"])
            B = mels.shape[0]
            if self.mesh is not None:
                # Pad partial batches to the batch-shard multiple; padded
                # rows are sliced off before they touch the confusion matrix
                # (they do enter the scalar eval_loss mean — accuracy, the
                # decision metric, is unaffected).
                from sar_tpu.parallel.distributed import n_batch_shards
                pad = (-B) % n_batch_shards(self.mesh)
                if pad:
                    mels = np.pad(mels, [(0, pad)] + [(0, 0)] * (mels.ndim - 1))
                    labels = np.pad(labels, (0, pad))
            loss, preds = self._eval_step(
                self.params, self.base_params,
                self._put(mels, 0), self._put(labels, 0))
            losses.append(float(loss))
            for t, p in zip(batch["language_ids"], np.asarray(preds)[:B]):
                confusion[int(t), int(p)] += 1
        metrics = self._lid_metrics(confusion, losses)
        for cb in self.callbacks:
            cb.on_evaluate_end(self, metrics)
        return metrics

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str | Path) -> None:
        """Classifier params + config AND training state (optimizer,
        global_step, best_metric) — parity with the reference's
        training_state.pt (/root/reference/scripts/train_router.py:533-550)."""
        import jax.numpy as jnp
        import orbax.checkpoint as ocp
        path = Path(path).resolve()
        clf.save_classifier(path, self.params, self.clf_cfg,
                            metadata={"global_step": self.global_step,
                                      "model": self.cfg.name})
        state = {
            "opt_state": self.opt_state,
            "global_step": jnp.int32(self.global_step),
            "best_metric": jnp.float32(
                self.best_metric if self.best_metric is not None else jnp.inf),
        }
        ck = ocp.StandardCheckpointer()
        target = path / "train_state"
        if target.exists():
            import shutil
            shutil.rmtree(target)
        ck.save(target, state)
        ck.wait_until_finished()

    def load_checkpoint(self, path: str | Path) -> None:
        """Restore classifier weights AND optimizer/step for --resume_from."""
        import jax.numpy as jnp
        import orbax.checkpoint as ocp
        path = Path(path).resolve()
        if (path / "classifier").exists():      # train_router.py output root
            path = path / "classifier"
        self.params, self.clf_cfg, _ = clf.load_classifier(path)
        if self.clf_cfg.encoder_layer != self.args.encoder_layer:
            raise ValueError(
                f"checkpoint was trained at encoder_layer="
                f"{self.clf_cfg.encoder_layer} but --encoder_layer is "
                f"{self.args.encoder_layer}; resume with the matching value")
        self.params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), self.params)
        if (path / "train_state").exists():
            ck = ocp.StandardCheckpointer()
            restored = ck.restore(path / "train_state", target={
                "opt_state": self.tx.init(self.params),
                "global_step": jnp.int32(0),
                "best_metric": jnp.float32(0),
            })
            self.opt_state = restored["opt_state"]
            self.global_step = int(restored["global_step"])
            best = float(restored["best_metric"])
            self.best_metric = None if best == float("inf") else best
        self._build_steps()
