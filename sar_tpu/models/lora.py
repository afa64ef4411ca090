"""LoRA adapter bank — stacked low-rank adapters as first-class pytrees.

Capability parity with the reference's PEFT wrapper
(/root/reference/src/models/whisper_lora.py: LoRA r/alpha/dropout on
q_proj/v_proj, save_adapter/load_adapter/merge_and_unload), re-designed for
TPU: adapters for ALL languages live in one stacked tensor per (layer,
target) — shape [L, A, d, r] — so routed inference gathers per-utterance
adapter weights on device (BGMV in sar_tpu.models.whisper.lora_delta) instead
of looping over samples on the host
(/root/reference/src/models/adapter_router.py:599-625,744-750).

Adapter bank layout:
    {"encoder": {"q": {"a": [L, A, d, r], "b": [L, A, r, d]}, "v": ...},
     "decoder": {"self_q": ..., "self_v": ..., "cross_q": ..., "cross_v": ...}}

Mixed ranks (the reference's r8/16/32/64 sweep) are supported when *stacking*
separately-trained adapters: every adapter is zero-padded to the bank's max
rank — LoRA deltas are invariant to zero-padded rank columns.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sar_tpu.models.config import WhisperConfig

# target_modules name (reference/PEFT convention) -> our per-stack hook keys.
_TARGET_MAP = {
    "q_proj": {"encoder": ("q",), "decoder": ("self_q", "cross_q")},
    "k_proj": {"encoder": ("k",), "decoder": ("self_k", "cross_k")},
    "v_proj": {"encoder": ("v",), "decoder": ("self_v", "cross_v")},
    "out_proj": {"encoder": ("o",), "decoder": ("self_o", "cross_o")},
}


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    """Defaults match the reference (whisper_lora.py:25-40 / train_lora.py:56-66)."""
    r: int = 16
    alpha: int = 32
    dropout: float = 0.1
    target_modules: tuple[str, ...] = ("q_proj", "v_proj")

    @property
    def scale(self) -> float:
        return self.alpha / self.r

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["target_modules"] = list(self.target_modules)
        return d

    @staticmethod
    def from_dict(d: dict) -> "LoraConfig":
        d = dict(d)
        d["target_modules"] = tuple(d.get("target_modules", ("q_proj", "v_proj")))
        return LoraConfig(**d)


def init_lora(key: jax.Array, cfg: WhisperConfig, lora_cfg: LoraConfig,
              num_adapters: int = 1, dtype=jnp.float32) -> dict:
    """Initialize an adapter bank. A ~ N(0, 1/r) (kaiming-style), B = 0, so the
    initial delta is exactly zero (standard LoRA init, what PEFT does)."""
    d = cfg.d_model
    r, A = lora_cfg.r, num_adapters
    bank: dict[str, Any] = {"encoder": {}, "decoder": {}}
    keys = iter(jax.random.split(key, 64))

    def entry(L):
        a = jax.random.normal(next(keys), (L, A, d, r), dtype) * (1.0 / r)
        b = jnp.zeros((L, A, r, d), dtype)
        return {"a": a, "b": b}

    for t in lora_cfg.target_modules:
        if t not in _TARGET_MAP:
            raise ValueError(f"Unsupported LoRA target {t!r}; "
                             f"choices: {sorted(_TARGET_MAP)}")
        for hook in _TARGET_MAP[t]["encoder"]:
            bank["encoder"][hook] = entry(cfg.encoder_layers)
        for hook in _TARGET_MAP[t]["decoder"]:
            bank["decoder"][hook] = entry(cfg.decoder_layers)
    return bank


def param_count(lora: dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(lora))


def trainable_summary(lora: dict, base_params: dict) -> dict:
    """Trainable-% log line, parity with whisper_lora.py:103-112."""
    from sar_tpu.models.whisper import param_count as base_count
    n_lora = param_count(lora)
    n_base = base_count(base_params)
    return {
        "trainable_params": n_lora,
        "total_params": n_base + n_lora,
        "trainable_percent": 100.0 * n_lora / (n_base + n_lora),
    }


def num_adapters(lora: dict) -> int:
    return jax.tree.leaves(lora)[0].shape[1]


def slice_adapter(lora: dict, index: int) -> dict:
    """Extract a single adapter (A dim -> 1) from a bank."""
    return jax.tree.map(lambda x: x[:, index:index + 1], lora)


def stack_adapters(adapters: list[dict], pad_to_rank: int | None = None) -> dict:
    """Stack single-adapter banks (possibly of different ranks) into one bank.

    Zero-pads each adapter's rank dim to the max — functionally identical
    deltas. This is how the per-language checkpoints of the reference's rank
    sweep (train_lora_array.sh grid) combine into one routed bank.
    """
    def rank_of(t):
        return jax.tree.leaves(t)[0].shape[-1]

    max_r = pad_to_rank or max(rank_of(a) for a in adapters)

    def pad(path, x):
        last = path[-1].key
        r_pad = max_r - (x.shape[-1] if last == "a" else x.shape[-2])
        if r_pad == 0:
            return x
        if last == "a":      # [L, 1, d, r]
            return jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, r_pad)])
        return jnp.pad(x, [(0, 0), (0, 0), (0, r_pad), (0, 0)])  # b: [L, 1, r, d]

    padded = [jax.tree_util.tree_map_with_path(pad, a) for a in adapters]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *padded)


def merge_lora(params: dict, lora: dict, lora_cfg: LoraConfig,
               adapter_index: int = 0) -> dict:
    """Fold one adapter into the base weights (W += scale * A @ B); parity
    with merge_and_unload (/root/reference/src/models/whisper_lora.py:234-240)."""
    merged = jax.tree.map(lambda x: x, params)  # shallow copy of the tree
    scale = lora_cfg.scale

    for side in ("encoder", "decoder"):
        for hook, entry in lora.get(side, {}).items():
            a = entry["a"][:, adapter_index]          # [L, d, r]
            b = entry["b"][:, adapter_index]          # [L, r, d]
            delta = scale * jnp.einsum("ldr,lrk->ldk", a, b)
            w = merged[side]["layers"][hook]["w"]
            merged[side]["layers"][hook] = dict(
                merged[side]["layers"][hook], w=w + delta.astype(w.dtype))
    return merged


# ---------------------------------------------------------------------------
# Checkpoint format: directory with adapter_config.json + adapter_params.npz
# (parity with PEFT's save_pretrained directory layout used at
# whisper_lora.py:207-232, but numpy-native).
# ---------------------------------------------------------------------------

def _flatten(tree: dict, prefix="") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_adapter(path: str | Path, lora: dict, lora_cfg: LoraConfig,
                 metadata: dict | None = None) -> None:
    """Save an adapter (or bank) to `path/` — parity with save_adapter
    (whisper_lora.py:207-217)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = {"lora": lora_cfg.to_dict(), "metadata": metadata or {}}
    (path / "adapter_config.json").write_text(json.dumps(cfg, indent=2))
    np.savez(path / "adapter_params.npz", **_flatten(lora))


def load_adapter(path: str | Path) -> tuple[dict, LoraConfig, dict]:
    """Load an adapter directory -> (bank, LoraConfig, metadata)."""
    path = Path(path)
    cfg = json.loads((path / "adapter_config.json").read_text())
    with np.load(path / "adapter_params.npz") as z:
        lora = _unflatten({k: z[k] for k in z.files})
    return lora, LoraConfig.from_dict(cfg["lora"]), cfg.get("metadata", {})


def load_any_adapter(path: str | Path, model_cfg) -> tuple[dict, LoraConfig, dict]:
    """Load either a sar_tpu adapter directory or a PEFT save_pretrained
    directory (the reference's trained-adapter format,
    /root/reference/src/models/whisper_lora.py:207-232) -> (bank, cfg, meta).

    `model_cfg` (WhisperConfig) supplies layer counts for the PEFT import.
    """
    from sar_tpu.models import convert
    path = Path(path)
    if convert.is_peft_checkpoint(path):
        bank, lcfg = convert.lora_from_peft(path, model_cfg)
        bank = jax.tree.map(jnp.asarray, bank)
        return bank, lcfg, {"format": "peft"}
    return load_adapter(path)
