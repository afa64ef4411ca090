"""AdapterRouter — routed multi-adapter inference, batched on device.

Capability parity with /root/reference/src/models/adapter_router.py:488-761
(strategies hard/soft/threshold, threshold default 0.7, language-override
generate, loss/logit aggregation semantics), re-designed TPU-first:

- HARD routing is ONE compiled forward over the whole mixed-language batch:
  the classifier argmax feeds the per-utterance adapter index of the stacked
  LoRA bank (BGMV gather) — no host round-trip, no per-sample Python loop
  (the reference loops batch_size forwards, :607-625, and batch_size
  generates, :744-750).
- SOFT routing runs the bank once per adapter on the full batch and
  probability-weights the logits; loss = sum_i mean(p_i) * loss_i (:647-663).
- THRESHOLD: hard when every sample is confident, else soft (mixed batches
  fall back to soft "for simplicity", :672-693) — same observable behavior.
- generate() reuses ONE encoder pass for all decode steps and decodes the
  whole batch together with per-sample language prompts.

Unlike the reference — where AdapterRouter exists but has no script driver
(SURVEY.md §2.3 gap) — this router is wired into the CLI
(scripts/route_infer.py).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sar_tpu.decode import greedy_decode
from sar_tpu.models import classifier as clf
from sar_tpu.models import lora as lora_lib
from sar_tpu.models import whisper
from sar_tpu.models.config import WhisperConfig


@dataclasses.dataclass
class AdapterRouter:
    """Frozen base + LID classifier + stacked adapter bank."""

    cfg: WhisperConfig
    base_params: dict
    bank: dict                      # stacked [L, A, d, r] LoRA bank
    lora_cfg: lora_lib.LoraConfig
    clf_params: dict
    clf_cfg: clf.ClassifierConfig
    strategy: str = "hard"          # hard | soft | threshold
    threshold: float = 0.7
    # Encoder attention dispatch for the inference paths (LID features +
    # banked encode): None -> "hm" on a single TPU chip, exact jnp
    # elsewhere. Mesh callers must pass False (the kernel has no SPMD rule).
    flash: bool | str | None = None

    def __post_init__(self):
        if self.flash is None:
            self.flash = "hm" if jax.default_backend() == "tpu" else False
        self.languages = list(self.clf_cfg.languages)
        self.lang_to_idx = {l: i for i, l in enumerate(self.languages)}
        # Per-language decoder prompts, stacked [A, P] for on-device gather.
        self._prompts = jnp.asarray(
            [self.cfg.prompt_ids(l) for l in self.languages], jnp.int32)

    # -- LID ---------------------------------------------------------------
    def extract_encoder_features(self, input_features: jnp.ndarray) -> jnp.ndarray:
        """Frozen base-encoder features at the tap layer the classifier was
        trained on (parity with :536-548)."""
        return clf.encode_features(self.base_params, input_features, self.cfg,
                                   layer_index=self.clf_cfg.encoder_layer,
                                   flash=self.flash)

    def detect_language(self, encoder_hidden_states) -> tuple[list[str], jnp.ndarray]:
        """(language names, probs); parity with :550-566."""
        idx, probs = clf.predict(self.clf_params, self.clf_cfg,
                                 encoder_hidden_states)
        return [self.languages[int(i)] for i in np.asarray(idx)], probs

    # -- Teacher-forced routing (training-style forward) ---------------------
    def forward(self, input_features: jnp.ndarray,
                labels: jnp.ndarray | None = None,
                strategy: str | None = None) -> dict:
        strategy = strategy or self.strategy
        feats = self.extract_encoder_features(input_features)
        idx, probs = clf.predict(self.clf_params, self.clf_cfg, feats)

        if strategy == "hard":
            return self._hard(input_features, idx, probs, labels)
        if strategy == "soft":
            return self._soft(input_features, probs, labels)
        if strategy == "threshold":
            return self._threshold(input_features, idx, probs, labels)
        raise ValueError(f"Unknown routing strategy: {strategy}")

    def _threshold(self, input_features, idx, probs, labels):
        """Hard when every sample clears the confidence threshold, else soft
        (reference :672-693). With labels this is a traced `lax.cond` — the
        confidence test stays on device (no host sync, fully jittable) and
        only the taken branch executes at runtime; the output dict carries
        the same keys either way, plus the traced `confident` flag."""
        confident = jnp.all(jnp.max(probs, axis=-1) > self.threshold)
        if labels is None:
            # Hard returns encoder activations and soft is undefined without
            # labels — the output STRUCTURE is data-dependent, so this one
            # path syncs the flag to host (reference behavior).
            if bool(confident):
                return self._hard(input_features, idx, probs, labels)
            return self._soft(input_features, probs, labels)
        logits, loss = jax.lax.cond(
            confident,
            lambda: self._hard_terms(input_features, idx, labels),
            lambda: self._soft_terms(input_features, probs, labels))
        return {"loss": loss, "logits": logits, "probs": probs,
                "adapter_idx": idx, "confident": confident}

    def _teacher_logits(self, input_features, labels, adapter_idx):
        dec_in = whisper.shift_tokens_right(labels, self.cfg.sot_token_id,
                                            self.cfg.pad_token_id)
        return whisper.forward(self.base_params, input_features, dec_in,
                               self.cfg, lora=self.bank,
                               adapter_idx=adapter_idx,
                               lora_scale=self.lora_cfg.scale)

    def _hard_terms(self, input_features, adapter_idx, labels):
        logits = self._teacher_logits(input_features, labels, adapter_idx)
        return logits, whisper.cross_entropy_loss(logits, labels)

    def _hard(self, input_features, adapter_idx, probs, labels):
        out = {"probs": probs, "adapter_idx": adapter_idx}
        if labels is not None:
            logits, loss = self._hard_terms(input_features, adapter_idx, labels)
            out["logits"] = logits
            out["loss"] = loss
        else:
            enc = whisper.encode(self.base_params, input_features, self.cfg,
                                 lora=self.bank, adapter_idx=adapter_idx,
                                 lora_scale=self.lora_cfg.scale,
                                 flash=self.flash)
            out["encoder_out"] = enc
        return out

    def _soft_terms(self, input_features, probs, labels):
        """All adapters on the full batch; prob-weighted logits (:627-670).
        Returns (weighted_logits, loss)."""
        B = input_features.shape[0]
        weighted = None
        loss = 0.0
        for i in range(len(self.languages)):
            idx = jnp.full((B,), i, jnp.int32)
            logits = self._teacher_logits(input_features, labels, idx)
            w = probs[:, i][:, None, None]
            weighted = w * logits if weighted is None else weighted + w * logits
            loss = loss + probs[:, i].mean() * whisper.cross_entropy_loss(
                logits, labels)
        return weighted, loss

    def _soft(self, input_features, probs, labels):
        if labels is None:
            raise ValueError("soft routing requires labels (teacher-forced)")
        weighted, loss = self._soft_terms(input_features, probs, labels)
        return {"loss": loss, "logits": weighted, "probs": probs}

    # -- Routed generation ----------------------------------------------------
    def generate(self, input_features: jnp.ndarray,
                 language: str | None = None,
                 adapter_idx: jnp.ndarray | None = None,
                 max_new_tokens: int = 256) -> jnp.ndarray:
        """Batched routed transcription (parity with :715-761; the reference's
        per-sample loop becomes one compiled decode). Pass `adapter_idx`
        (e.g. from an earlier detect_language) to skip re-detection."""
        B = input_features.shape[0]
        if language is not None:
            idx = jnp.full((B,), self.lang_to_idx[language], jnp.int32)
        elif adapter_idx is not None:
            idx = jnp.asarray(adapter_idx, jnp.int32)
        else:
            feats = self.extract_encoder_features(input_features)
            idx, _ = clf.predict(self.clf_params, self.clf_cfg, feats)
            idx = idx.astype(jnp.int32)
        enc = whisper.encode(self.base_params, input_features, self.cfg,
                             lora=self.bank, adapter_idx=idx,
                             lora_scale=self.lora_cfg.scale, flash=self.flash)
        prompts = self._prompts[idx]                      # [B, P]
        return greedy_decode(self.base_params, enc, self.cfg, prompts,
                             max_new_tokens=max_new_tokens, lora=self.bank,
                             adapter_idx=idx, lora_scale=self.lora_cfg.scale)

    @property
    def prompt_len(self) -> int:
        return int(self._prompts.shape[1])

    # -- Persistence ---------------------------------------------------------
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        lora_lib.save_adapter(path / "bank", self.bank, self.lora_cfg,
                              metadata={"languages": self.languages})
        clf.save_classifier(path / "classifier", self.clf_params, self.clf_cfg)
        (path / "router_config.json").write_text(json.dumps({
            "model": self.cfg.name, "strategy": self.strategy,
            "threshold": self.threshold}, indent=2))

    @staticmethod
    def load(path: str | Path, cfg: WhisperConfig, base_params: dict
             ) -> "AdapterRouter":
        path = Path(path)
        rc = json.loads((path / "router_config.json").read_text())
        bank, lora_cfg, _ = lora_lib.load_adapter(path / "bank")
        clf_params, clf_cfg, _ = clf.load_classifier(path / "classifier")
        return AdapterRouter(cfg, base_params, bank, lora_cfg, clf_params,
                             clf_cfg, strategy=rc["strategy"],
                             threshold=rc["threshold"])


def build_router_from_checkpoints(
        cfg: WhisperConfig, base_params: dict, adapter_dirs: dict[str, str],
        clf_params: dict, clf_cfg: clf.ClassifierConfig,
        strategy: str = "hard", threshold: float = 0.7) -> AdapterRouter:
    """Assemble a router from per-language adapter checkpoint dirs (the output
    of train_lora runs), stacking them — mixed ranks allowed — in the
    classifier's language order."""
    adapters, scales = [], []
    for lang in clf_cfg.languages:
        bank, lcfg, _ = lora_lib.load_any_adapter(adapter_dirs[lang], cfg)
        if lora_lib.num_adapters(bank) != 1:
            raise ValueError(f"{adapter_dirs[lang]} holds a bank, not a single adapter")
        # Fold each adapter's own alpha/r scale into B so one bank-level
        # scale of 1.0 serves mixed-rank/mixed-alpha adapters.
        bank = jax.tree_util.tree_map_with_path(
            lambda p, x: x * lcfg.scale if p[-1].key == "b" else x, bank)
        adapters.append(bank)
    stacked = lora_lib.stack_adapters(adapters)
    lora_cfg = lora_lib.LoraConfig(r=jax.tree.leaves(stacked)[0].shape[-1],
                                   alpha=jax.tree.leaves(stacked)[0].shape[-1],
                                   dropout=0.0)
    return AdapterRouter(cfg, base_params, stacked, lora_cfg, clf_params,
                         clf_cfg, strategy=strategy, threshold=threshold)
