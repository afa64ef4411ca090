"""Language-identification (LID) classifier — the Phase-2 gating head.

Capability parity with /root/reference/src/models/adapter_router.py:14-389
(LanguageClassifier), functional JAX:
- optional input LayerNorm (:68)
- optional 2-layer 1D-CNN temporal front, kernel 5, ReLU+Dropout (:73-81)
- MLP with hidden dims [256,128]: Linear+LayerNorm+ReLU+Dropout (:84-97)
- pooling mean | max | attention, mask-aware (:210-249); attention pooling is
  a Tanh-MLP scorer softmaxed over time (:100-105)
- CE loss with label smoothing and class weights (:107-144)
- class-weight strategies inverse_freq / inverse_sqrt / effective_samples
  (class-balanced loss, CVPR 2019), max-weight clipping, uniform smoothing,
  mean-normalized (:146-208)
- predict / predict_language helpers (:295-330), save/load with embedded
  config (:332-389)

Also provides `encode_features` — the functional equivalent of
EncoderFeatureExtractor (:392-485): a frozen encoder pass with an optional
specific-layer tap.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sar_tpu.models.config import WhisperConfig


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    input_dim: int = 768
    hidden_dims: tuple[int, ...] = (256, 128)
    num_classes: int = 4
    dropout: float = 0.3
    pooling: str = "mean"               # mean | max | attention
    use_layer_norm: bool = True
    use_cnn: bool = False
    cnn_channels: int = 256
    cnn_kernel_size: int = 5
    label_smoothing: float = 0.0
    languages: tuple[str, ...] = ("hindi", "italian", "punjabi", "telugu")
    class_weights: tuple[float, ...] | None = None
    # Which encoder layer the head was TRAINED to consume (-1 = final
    # post-LN output). Stored in the config so inference paths (router,
    # serving) tap the same layer the checkpoint was trained at — the
    # reference leaves this implicit in run scripts, which silently
    # mismatches when --encoder_layer != -1. Old checkpoints load as -1.
    encoder_layer: int = -1

    def lang_to_idx(self, lang: str) -> int:
        return self.languages.index(lang)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["hidden_dims"] = list(self.hidden_dims)
        d["languages"] = list(self.languages)
        d["class_weights"] = (list(self.class_weights)
                              if self.class_weights is not None else None)
        return d

    @staticmethod
    def from_dict(d: dict) -> "ClassifierConfig":
        d = dict(d)
        for k in ("hidden_dims", "languages"):
            if k in d and d[k] is not None:
                d[k] = tuple(d[k])
        if d.get("class_weights") is not None:
            d["class_weights"] = tuple(d["class_weights"])
        return ClassifierConfig(**d)


def compute_class_weights_from_counts(
        class_counts: dict[str, int], languages: list[str] | tuple[str, ...],
        strategy: str = "inverse_freq", max_weight: float | None = None,
        smoothing: float = 0.0) -> np.ndarray:
    """Parity with adapter_router.py:146-208."""
    counts = np.asarray([class_counts.get(l, 1) for l in languages], np.float64)
    total, n = counts.sum(), len(languages)
    if strategy == "inverse_freq":
        weights = total / (n * counts)
    elif strategy == "inverse_sqrt":
        weights = np.sqrt(counts.max() / counts)
    elif strategy == "effective_samples":
        beta = 0.9999
        eff = 1.0 - np.power(beta, counts)
        weights = (1.0 - beta) / eff
        weights = weights / weights.sum() * n
    else:
        raise ValueError(f"Unknown strategy: {strategy}")
    weights = weights / weights.mean()
    if max_weight is not None:
        weights = np.minimum(weights, max_weight)
        weights = weights / weights.mean()
    if smoothing > 0:
        weights = (1 - smoothing) * weights + smoothing
        weights = weights / weights.mean()
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# Init / apply
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out):
    # torch-default-style uniform(-1/sqrt(d_in), 1/sqrt(d_in)).
    bound = 1.0 / np.sqrt(d_in)
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)}


def init_classifier(key: jax.Array, ccfg: ClassifierConfig) -> dict:
    keys = iter(jax.random.split(key, 16))
    p: dict = {}
    d = ccfg.input_dim
    if ccfg.use_layer_norm:
        p["ln"] = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    feat_dim = d
    if ccfg.use_cnn:
        k, c = ccfg.cnn_kernel_size, ccfg.cnn_channels
        bound1, bound2 = 1 / np.sqrt(d * k), 1 / np.sqrt(c * k)
        p["cnn1"] = {"w": jax.random.uniform(next(keys), (k, d, c), jnp.float32,
                                             -bound1, bound1),
                     "b": jnp.zeros((c,))}
        p["cnn2"] = {"w": jax.random.uniform(next(keys), (k, c, c), jnp.float32,
                                             -bound2, bound2),
                     "b": jnp.zeros((c,))}
        feat_dim = c
    prev = feat_dim
    for i, h in enumerate(ccfg.hidden_dims):
        p[f"mlp_{i}"] = _init_linear(next(keys), prev, h)
        p[f"mlp_ln_{i}"] = {"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))}
        prev = h
    p["out"] = _init_linear(next(keys), prev, ccfg.num_classes)
    if ccfg.pooling == "attention":
        p["attn1"] = _init_linear(next(keys), feat_dim, 128)
        p["attn2"] = _init_linear(next(keys), 128, 1)
    return p


def _ln(x, p, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dropout(x, rate, rng, salt):
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(jax.random.fold_in(rng, salt), 1 - rate, x.shape)
    return x * keep / (1 - rate)


def _pool(params, ccfg, feats, mask):
    """feats: [B, T, C]; mask: [B, T] bool or None. Parity with :210-249."""
    if ccfg.pooling == "mean":
        if mask is None:
            return feats.mean(axis=1)
        m = mask[..., None].astype(feats.dtype)
        return (feats * m).sum(axis=1) / (m.sum(axis=1) + 1e-8)
    if ccfg.pooling == "max":
        if mask is not None:
            feats = jnp.where(mask[..., None], feats, -jnp.inf)
        return feats.max(axis=1)
    if ccfg.pooling == "attention":
        h = jnp.tanh(feats @ params["attn1"]["w"] + params["attn1"]["b"])
        scores = h @ params["attn2"]["w"] + params["attn2"]["b"]   # [B, T, 1]
        if mask is not None:
            scores = jnp.where(mask[..., None], scores, -jnp.inf)
        w = jax.nn.softmax(scores, axis=1)
        return (feats * w).sum(axis=1)
    raise ValueError(f"Unknown pooling: {ccfg.pooling}")


def apply_classifier(params: dict, ccfg: ClassifierConfig,
                     hidden_states: jnp.ndarray,
                     attention_mask: jnp.ndarray | None = None,
                     labels: jnp.ndarray | None = None,
                     train: bool = False,
                     rng: jax.Array | None = None) -> dict:
    """Forward pass -> {"logits", "probs", "loss"}; parity with :251-293."""
    x = hidden_states.astype(jnp.float32)
    drop_rng = rng if train else None
    if ccfg.use_layer_norm:
        x = _ln(x, params["ln"])
    if ccfg.use_cnn:
        for i, name in enumerate(("cnn1", "cnn2")):
            x = jax.lax.conv_general_dilated(
                x, params[name]["w"], window_strides=(1,),
                padding=[(ccfg.cnn_kernel_size // 2,) * 2],
                dimension_numbers=("NHC", "HIO", "NHC")) + params[name]["b"]
            x = jax.nn.relu(x)
            x = _dropout(x, ccfg.dropout, drop_rng, 10 + i)
    pooled = _pool(params, ccfg, x, attention_mask)
    h = pooled
    for i in range(len(ccfg.hidden_dims)):
        h = h @ params[f"mlp_{i}"]["w"] + params[f"mlp_{i}"]["b"]
        h = _ln(h, params[f"mlp_ln_{i}"])
        h = jax.nn.relu(h)
        h = _dropout(h, ccfg.dropout, drop_rng, 20 + i)
    logits = h @ params["out"]["w"] + params["out"]["b"]
    probs = jax.nn.softmax(logits, axis=-1)

    loss = None
    if labels is not None:
        loss = _weighted_smoothed_ce(logits, labels, ccfg)
    return {"logits": logits, "probs": probs, "loss": loss}


def _weighted_smoothed_ce(logits, labels, ccfg: ClassifierConfig):
    """torch CrossEntropyLoss semantics: label smoothing + per-class weights
    (weighted mean normalized by the summed weights of the targets)."""
    K = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    eps = ccfg.label_smoothing
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if ccfg.class_weights is None:
        smooth = -logp.mean(axis=-1)
        return ((1 - eps) * nll + eps * smooth).mean()
    # torch semantics: class-weighted NLL and class-weighted smooth term,
    # normalized by the summed target weights.
    w = jnp.asarray(ccfg.class_weights)
    wy = w[labels]
    smooth = -(logp * w[None, :]).sum(axis=-1) / K
    return ((1 - eps) * (nll * wy).sum() + eps * smooth.sum()) \
        / jnp.maximum(wy.sum(), 1e-8)


def predict(params, ccfg, hidden_states, attention_mask=None):
    """(labels, probs) argmax helper; parity with :295-311."""
    out = apply_classifier(params, ccfg, hidden_states, attention_mask)
    return jnp.argmax(out["probs"], axis=-1), out["probs"]


def predict_language(params, ccfg, hidden_states, attention_mask=None):
    """(language names, probs); parity with :313-330."""
    labels, probs = predict(params, ccfg, hidden_states, attention_mask)
    return [ccfg.languages[int(i)] for i in np.asarray(labels)], probs


# ---------------------------------------------------------------------------
# Encoder feature extraction (EncoderFeatureExtractor parity, :392-485)
# ---------------------------------------------------------------------------

def encode_features(base_params: dict, mel: jnp.ndarray, cfg: WhisperConfig,
                    layer_index: int = -1,
                    flash: bool | str = False) -> jnp.ndarray:
    """Frozen encoder features for LID. layer_index=-1 -> final post-LN output
    (last_hidden_state); k >= 0 -> output of encoder layer k (0-based).

    `flash`: attention dispatch, same values as whisper.encode — pass "hm"
    on a single TPU chip (the head-minor inference kernel; no SPMD rule, so
    mesh callers keep the default exact jnp attention)."""
    from sar_tpu.models import whisper

    if layer_index == -1:
        return jax.lax.stop_gradient(
            whisper.encode(base_params, mel, cfg, flash=flash))

    enc = base_params["encoder"]
    dtype = enc["conv1"]["w"].dtype
    x = mel.transpose(0, 2, 1).astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, enc["conv1"]["w"].astype(dtype), window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC")) + enc["conv1"]["b"].astype(dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2"]["w"].astype(dtype), window_strides=(2,), padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC")) + enc["conv2"]["b"].astype(dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = x + enc["pos_embed"][:x.shape[1]].astype(dtype)

    # `layer_index` is static: slice the stacked layer params to the tap
    # depth and scan only those, carrying a single [B, T, D] activation —
    # stacking every layer's output ([L, B, T, D]) just to index one would
    # cost ~L× the needed activation memory at whisper-large.
    L = jax.tree.leaves(enc["layers"])[0].shape[0]
    k = layer_index if layer_index >= 0 else L + layer_index
    if not 0 <= k < L:
        raise ValueError(f"layer_index {layer_index} out of range for "
                         f"{L}-layer encoder")
    tapped = jax.tree.map(lambda a: a[:k + 1], enc["layers"])

    T = x.shape[1]
    if flash == "fq":
        flash = "hm"            # no LoRA here, but fq buys nothing for taps
    pad = whisper.cross_pad_len(T) - T if flash == "hm" else 0
    if pad:
        # Same convention as whisper.encode: the hm kernel runs on a
        # 128-aligned T; masked keys keep padded rows out of real rows.
        x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])

    def body(carry, p):
        y = whisper._enc_layer_apply(carry, p, None, whisper.LoraCtx(),
                                     cfg.encoder_heads, flash=flash,
                                     t_valid=T)
        return y, None

    x, _ = jax.lax.scan(body, x, tapped)
    if pad:
        x = x[:, :T]
    return jax.lax.stop_gradient(x)


def get_hidden_dim(cfg: WhisperConfig) -> int:
    """Parity with :476-485."""
    return cfg.d_model


class LanguageClassifier:
    """Object handle bundling (params, config) — the parity-named class for
    users porting from the reference's nn.Module (adapter_router.py:14).
    Compute goes through the functional apply_classifier/predict."""

    def __init__(self, config: ClassifierConfig,
                 params: dict | None = None, seed: int = 0):
        self.config = config
        self.params = params if params is not None else init_classifier(
            jax.random.PRNGKey(seed), config)

    def __call__(self, hidden_states, attention_mask=None, labels=None,
                 train=False, rng=None):
        return apply_classifier(self.params, self.config, hidden_states,
                                attention_mask, labels, train, rng)

    forward = __call__

    def predict(self, hidden_states, attention_mask=None):
        return predict(self.params, self.config, hidden_states, attention_mask)

    def predict_language(self, hidden_states, attention_mask=None):
        return predict_language(self.params, self.config, hidden_states,
                                attention_mask)

    def save(self, path, metadata=None):
        save_classifier(path, self.params, self.config, metadata)

    @staticmethod
    def load(path) -> "LanguageClassifier":
        params, cfg, _ = load_classifier(path)
        return LanguageClassifier(cfg, params)


# ---------------------------------------------------------------------------
# Save / load (parity with :332-389)
# ---------------------------------------------------------------------------

def save_classifier(path: str | Path, params: dict, ccfg: ClassifierConfig,
                    metadata: dict | None = None) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "classifier_config.json").write_text(json.dumps(
        {"config": ccfg.to_dict(), "metadata": metadata or {}}, indent=2))
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    np.savez(path / "classifier_params.npz", **flat)


def load_classifier(path: str | Path) -> tuple[dict, ClassifierConfig, dict]:
    path = Path(path)
    blob = json.loads((path / "classifier_config.json").read_text())
    with np.load(path / "classifier_params.npz") as z:
        params = _unflatten({k: z[k] for k in z.files})
    return params, ClassifierConfig.from_dict(blob["config"]), blob.get("metadata", {})


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree
