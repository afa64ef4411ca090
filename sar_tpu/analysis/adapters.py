"""Phase-3: adapter analysis / interpretability.

The reference PLANS this phase but never implements it — no
analyze_adapters.py or src/utils exists despite being in the planned tree
(/root/reference/PROJECT_REQUIREMENTS.md:370-546, :53,67-68,73; SURVEY.md
notes the gap). This module delivers it:

- per-(layer, target) LoRA delta magnitudes (||scale * A @ B||_F), showing
  WHERE in the network an adapter concentrates its change
- effective rank of each delta (entropy of its singular values), showing how
  much of the allotted rank budget a layer actually uses
- cross-adapter similarity (cosine over flattened deltas per layer/target),
  quantifying how related two languages' adaptations are

SVDs are computed on the small r x d factor (A = QR; svd(A @ B) == svd(R @ B)),
so analysis is cheap even for whisper-large banks.
"""

from __future__ import annotations

import numpy as np

from sar_tpu.models import lora as lora_lib


def _delta_singular_values(a: np.ndarray, b: np.ndarray, scale: float
                           ) -> np.ndarray:
    """Singular values of scale * (a @ b) via the thin factor. a: [d, r],
    b: [r, d]."""
    q, r_mat = np.linalg.qr(a)
    small = scale * (r_mat @ b)                 # [r, d]
    return np.linalg.svd(small, compute_uv=False)


def _effective_rank(sv: np.ndarray, eps: float = 1e-12) -> float:
    """exp(entropy) of the normalized singular value distribution."""
    p = sv / max(sv.sum(), eps)
    p = p[p > eps]
    return float(np.exp(-(p * np.log(p)).sum())) if p.size else 0.0


def analyze_adapter(bank: dict, lora_cfg: lora_lib.LoraConfig,
                    adapter_index: int = 0) -> dict:
    """Per-(side, target, layer) delta norms and effective ranks."""
    out: dict = {"rank": lora_cfg.r, "alpha": lora_cfg.alpha, "layers": {}}
    scale = lora_cfg.scale
    for side, targets in bank.items():
        for target, entry in targets.items():
            key = f"{side}.{target}"
            a_all = np.asarray(entry["a"][:, adapter_index], np.float32)  # [L,d,r]
            b_all = np.asarray(entry["b"][:, adapter_index], np.float32)  # [L,r,d]
            rows = []
            for l in range(a_all.shape[0]):
                sv = _delta_singular_values(a_all[l], b_all[l], scale)
                rows.append({
                    "layer": l,
                    "frobenius_norm": float(np.sqrt((sv ** 2).sum())),
                    "spectral_norm": float(sv[0]) if sv.size else 0.0,
                    "effective_rank": _effective_rank(sv),
                })
            out["layers"][key] = rows
    # Aggregate: which targets/depths carry the most adaptation.
    out["total_norm_by_target"] = {
        k: float(np.sqrt(sum(r["frobenius_norm"] ** 2 for r in rows)))
        for k, rows in out["layers"].items()}
    return out


def adapter_similarity(bank_a: dict, bank_b: dict, scale_a: float,
                       scale_b: float) -> dict:
    """Cosine similarity of flattened deltas per (side, target, layer)."""
    sims: dict = {}
    for side in bank_a:
        for target in bank_a[side]:
            if target not in bank_b.get(side, {}):
                continue
            ea, eb = bank_a[side][target], bank_b[side][target]
            L = ea["a"].shape[0]
            rows = []
            for l in range(L):
                da = scale_a * (np.asarray(ea["a"][l, 0], np.float32)
                                @ np.asarray(ea["b"][l, 0], np.float32))
                db = scale_b * (np.asarray(eb["a"][l, 0], np.float32)
                                @ np.asarray(eb["b"][l, 0], np.float32))
                denom = np.linalg.norm(da) * np.linalg.norm(db)
                rows.append(float((da * db).sum() / denom) if denom > 0 else 0.0)
            sims[f"{side}.{target}"] = rows
    flat = [v for rows in sims.values() for v in rows]
    return {"per_layer": sims,
            "mean_similarity": float(np.mean(flat)) if flat else 0.0}


def _resolve_peft_cfg(path, model):
    """WhisperConfig for a PEFT dir: an explicit override (name or config
    object), else the registry entry whose HF hub id matches the
    checkpoint's base_model_name_or_path."""
    import json
    from pathlib import Path

    from sar_tpu.models.config import (HF_MODEL_IDS, WhisperConfig,
                                       get_config)
    if isinstance(model, WhisperConfig):
        return model
    if model is not None:
        return get_config(model)
    base = json.loads((Path(path) / "adapter_config.json").read_text()).get(
        "base_model_name_or_path", "")
    for name, hub in HF_MODEL_IDS.items():
        if hub == base:
            return get_config(name)
    raise ValueError(
        f"cannot infer the base model for PEFT checkpoint {path} "
        f"(base_model_name_or_path={base!r}); pass model= / --model")


def compare_adapters(adapter_dirs: dict[str, str], model=None) -> dict:
    """Full cross-language analysis from checkpoint dirs:
    {language: analysis} + pairwise similarity matrix.

    Accepts sar_tpu adapter dirs AND the reference's PEFT save_pretrained
    dirs (/root/reference/src/models/whisper_lora.py:207-232); `model`
    (registry name or WhisperConfig) overrides the base-model inference
    for PEFT dirs."""
    from sar_tpu.models import convert
    banks = {}
    for lang, path in adapter_dirs.items():
        if convert.is_peft_checkpoint(path):
            bank, lcfg = convert.lora_from_peft(
                path, _resolve_peft_cfg(path, model))
        else:
            bank, lcfg, _ = lora_lib.load_adapter(path)
        banks[lang] = (bank, lcfg)
    report = {"adapters": {}, "pairwise_similarity": {}}
    for lang, (bank, lcfg) in banks.items():
        report["adapters"][lang] = analyze_adapter(bank, lcfg)
    langs = sorted(banks)
    for i, la in enumerate(langs):
        for lb in langs[i + 1:]:
            sim = adapter_similarity(banks[la][0], banks[lb][0],
                                     banks[la][1].scale, banks[lb][1].scale)
            report["pairwise_similarity"][f"{la}/{lb}"] = sim["mean_similarity"]
    return report
