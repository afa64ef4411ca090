"""HF Whisper checkpoint -> sar_tpu pytree converter.

The reference loads weights with transformers' from_pretrained
(/root/reference/src/models/base.py:77-131). Here the torch checkpoint is a
one-time import format: weights are transposed to [d_in, d_out], conv kernels
to [k, in, out], and per-layer tensors stacked on a leading [L, ...] axis for
lax.scan. Works offline from a state_dict or an in-memory HF model (used by
the parity tests with random-init tiny configs).
"""

from __future__ import annotations

import re

import numpy as np

from sar_tpu.models.config import WhisperConfig


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd, prefix, bias=True):
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    if bias:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _stack(dicts):
    out = {}
    for key in dicts[0]:
        if isinstance(dicts[0][key], dict):
            out[key] = _stack([d[key] for d in dicts])
        else:
            out[key] = np.stack([d[key] for d in dicts])
    return out


def _enc_layer(sd, p):
    return {
        "attn_ln": _ln(sd, f"{p}.self_attn_layer_norm"),
        "q": _linear(sd, f"{p}.self_attn.q_proj"),
        "k": _linear(sd, f"{p}.self_attn.k_proj", bias=False),
        "v": _linear(sd, f"{p}.self_attn.v_proj"),
        "o": _linear(sd, f"{p}.self_attn.out_proj"),
        "mlp_ln": _ln(sd, f"{p}.final_layer_norm"),
        "fc1": _linear(sd, f"{p}.fc1"),
        "fc2": _linear(sd, f"{p}.fc2"),
    }


def _dec_layer(sd, p):
    return {
        "self_ln": _ln(sd, f"{p}.self_attn_layer_norm"),
        "self_q": _linear(sd, f"{p}.self_attn.q_proj"),
        "self_k": _linear(sd, f"{p}.self_attn.k_proj", bias=False),
        "self_v": _linear(sd, f"{p}.self_attn.v_proj"),
        "self_o": _linear(sd, f"{p}.self_attn.out_proj"),
        "cross_ln": _ln(sd, f"{p}.encoder_attn_layer_norm"),
        "cross_q": _linear(sd, f"{p}.encoder_attn.q_proj"),
        "cross_k": _linear(sd, f"{p}.encoder_attn.k_proj", bias=False),
        "cross_v": _linear(sd, f"{p}.encoder_attn.v_proj"),
        "cross_o": _linear(sd, f"{p}.encoder_attn.out_proj"),
        "mlp_ln": _ln(sd, f"{p}.final_layer_norm"),
        "fc1": _linear(sd, f"{p}.fc1"),
        "fc2": _linear(sd, f"{p}.fc2"),
    }


def from_state_dict(sd: dict, cfg: WhisperConfig) -> dict:
    """Convert an HF WhisperForConditionalGeneration state_dict to a pytree."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    enc_layers = _stack([_enc_layer(sd, f"encoder.layers.{i}")
                         for i in range(cfg.encoder_layers)])
    dec_layers = _stack([_dec_layer(sd, f"decoder.layers.{i}")
                         for i in range(cfg.decoder_layers)])
    return {
        "encoder": {
            # torch Conv1d weight is [out, in, k] -> [k, in, out].
            "conv1": {"w": _np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
                      "b": _np(sd["encoder.conv1.bias"])},
            "conv2": {"w": _np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
                      "b": _np(sd["encoder.conv2.bias"])},
            "pos_embed": _np(sd["encoder.embed_positions.weight"]),
            "layers": enc_layers,
            "ln": _ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "token_embed": _np(sd["decoder.embed_tokens.weight"]),
            "pos_embed": _np(sd["decoder.embed_positions.weight"]),
            "layers": dec_layers,
            "ln": _ln(sd, "decoder.layer_norm"),
        },
    }


def from_hf_model(model, cfg: WhisperConfig) -> dict:
    """Convert an in-memory HF model (e.g. a random-init tiny one in tests)."""
    return from_state_dict(dict(model.state_dict()), cfg)


# ---------------------------------------------------------------------------
# PEFT adapter-checkpoint interop.
#
# The reference's trained artifacts are PEFT `save_pretrained` directories
# (/root/reference/src/models/whisper_lora.py:207-232, loaded at :283-321):
# adapter_config.json (peft schema) + adapter_model.safetensors with keys like
#     base_model.model.model.encoder.layers.0.self_attn.q_proj.lora_A.weight
# lora_A.weight is [r, d_in] and lora_B.weight is [d_out, r]; the delta is
# scale * x @ A^T @ B^T, which maps to our bank entries a = A^T ([d, r]) and
# b = B^T ([r, d]) so that delta = scale * (x @ a) @ b matches exactly.
# ---------------------------------------------------------------------------

_PEFT_KEY_RE = re.compile(
    r"(?:.*\.)?model\.(encoder|decoder)\.layers\.(\d+)\."
    r"(self_attn|encoder_attn)\.(q_proj|k_proj|v_proj|out_proj)\."
    r"lora_(A|B)(?:\.[^.]+)?\.weight$")

# (side, attn, target) -> our per-stack hook key (see lora._TARGET_MAP).
_PEFT_HOOKS = {
    ("encoder", "self_attn", "q_proj"): "q",
    ("encoder", "self_attn", "k_proj"): "k",
    ("encoder", "self_attn", "v_proj"): "v",
    ("encoder", "self_attn", "out_proj"): "o",
    ("decoder", "self_attn", "q_proj"): "self_q",
    ("decoder", "self_attn", "k_proj"): "self_k",
    ("decoder", "self_attn", "v_proj"): "self_v",
    ("decoder", "self_attn", "out_proj"): "self_o",
    ("decoder", "encoder_attn", "q_proj"): "cross_q",
    ("decoder", "encoder_attn", "k_proj"): "cross_k",
    ("decoder", "encoder_attn", "v_proj"): "cross_v",
    ("decoder", "encoder_attn", "out_proj"): "cross_o",
}


def lora_from_peft_state_dict(sd: dict, cfg: WhisperConfig) -> dict:
    """PEFT lora tensors (in-memory state_dict or loaded safetensors) ->
    a single-adapter bank ({side: {hook: {a: [L, 1, d, r], b: ...}}}).

    Layers a hook never matched (e.g. peft `layers_to_transform` subsets)
    stay zero — a zero-rank delta is a no-op, so the import is exact.
    """
    found: dict[tuple[str, str], dict[int, np.ndarray]] = {}
    for key, tensor in sd.items():
        m = _PEFT_KEY_RE.match(key)
        if not m:
            continue
        side, layer, attn, target, ab = m.groups()
        hook = _PEFT_HOOKS[(side, attn, target)]
        found.setdefault((side, hook, ab), {})[int(layer)] = _np(tensor)
    if not found:
        raise ValueError("no PEFT lora_A/lora_B whisper keys found in "
                         f"state_dict ({len(sd)} entries)")
    ranks = {t.shape[0 if ab == "A" else 1]
             for (_, _, ab), lt in found.items() for t in lt.values()}
    if len(ranks) != 1:
        raise ValueError(f"mixed LoRA ranks in one PEFT checkpoint: {ranks}; "
                         "import each rank separately and combine with "
                         "lora.stack_adapters")
    r = ranks.pop()

    bank: dict = {"encoder": {}, "decoder": {}}
    n_layers = {"encoder": cfg.encoder_layers, "decoder": cfg.decoder_layers}
    for (side, hook, ab), per_layer in found.items():
        L = n_layers[side]
        entry = bank[side].setdefault(hook, {})
        # a: [L, 1, d, r] = lora_A^T; b: [L, 1, r, d] = lora_B^T.
        sample = next(iter(per_layer.values()))
        d = sample.shape[1] if ab == "A" else sample.shape[0]
        shape = (L, 1, d, r) if ab == "A" else (L, 1, r, d)
        stacked = np.zeros(shape, np.float32)
        for layer, t in per_layer.items():
            if layer >= L:
                raise ValueError(f"PEFT key references layer {layer} but "
                                 f"{side} has {L} layers")
            stacked[layer, 0] = t.T
        entry["a" if ab == "A" else "b"] = stacked
    for side in list(bank):
        for hook, entry in bank[side].items():
            if set(entry) != {"a", "b"}:
                raise ValueError(f"incomplete PEFT pair for {side}/{hook}: "
                                 f"has {sorted(entry)}")
        if not bank[side]:
            del bank[side]
    return bank


def lora_from_peft(path, cfg: WhisperConfig):
    """Load a PEFT `save_pretrained` directory -> (bank, LoraConfig).

    Reads adapter_config.json + adapter_model.safetensors (or the legacy
    adapter_model.bin). This is the interop path for evaluating the
    reference's own trained adapters (whisper_lora.py:207-232) in sar_tpu.
    """
    import json
    from pathlib import Path

    from sar_tpu.models.lora import LoraConfig

    path = Path(path)
    pcfg = json.loads((path / "adapter_config.json").read_text())
    if pcfg.get("peft_type", "LORA").upper() != "LORA":
        raise ValueError(f"not a LoRA PEFT checkpoint: {pcfg.get('peft_type')}")
    for unsupported in ("use_rslora", "use_dora"):
        if pcfg.get(unsupported):
            raise ValueError(f"PEFT option {unsupported} is not supported")
    if pcfg.get("rank_pattern") or pcfg.get("alpha_pattern"):
        raise ValueError("PEFT rank_pattern/alpha_pattern are not supported")

    st_file = path / "adapter_model.safetensors"
    if st_file.exists():
        from safetensors.numpy import load_file
        sd = load_file(st_file)
    else:
        bin_file = path / "adapter_model.bin"
        if not bin_file.exists():
            raise FileNotFoundError(
                f"no adapter_model.safetensors or .bin under {path}")
        import torch
        sd = torch.load(bin_file, map_location="cpu", weights_only=True)

    bank = lora_from_peft_state_dict(sd, cfg)
    lcfg = LoraConfig(
        r=int(pcfg["r"]), alpha=int(pcfg["lora_alpha"]),
        dropout=float(pcfg.get("lora_dropout", 0.0)),
        target_modules=tuple(sorted(pcfg.get("target_modules") or
                                    ("q_proj", "v_proj"))))
    return bank, lcfg


def is_peft_checkpoint(path) -> bool:
    """True when `path` is a PEFT save_pretrained directory (the reference's
    adapter format) rather than a sar_tpu adapter directory."""
    from pathlib import Path
    path = Path(path)
    return ((path / "adapter_model.safetensors").exists()
            or (path / "adapter_model.bin").exists())


def config_from_hf(hf_config) -> WhisperConfig:
    """Derive a WhisperConfig from an HF WhisperConfig (for arbitrary sizes)."""
    return WhisperConfig(
        name="whisper-custom",
        vocab_size=hf_config.vocab_size,
        num_mel_bins=hf_config.num_mel_bins,
        d_model=hf_config.d_model,
        encoder_layers=hf_config.encoder_layers,
        encoder_heads=hf_config.encoder_attention_heads,
        decoder_layers=hf_config.decoder_layers,
        decoder_heads=hf_config.decoder_attention_heads,
        ffn_dim=hf_config.encoder_ffn_dim,
        max_source_positions=hf_config.max_source_positions,
        max_target_positions=hf_config.max_target_positions,
        eos_token_id=hf_config.eos_token_id,
        sot_token_id=hf_config.decoder_start_token_id,
        pad_token_id=hf_config.pad_token_id,
        alignment_heads=alignment_heads_from_hf(hf_config),
    )


def alignment_heads_from_hf(hf_obj) -> tuple[tuple[int, int], ...] | None:
    """Pull the word-timestamp alignment heads from an HF config or
    generation config (generation_config.json "alignment_heads": [[l, h],
    ...]). Checkpoints ship these; without them the aligner uses its
    upper-half-layers heuristic (sar_tpu/decode/align.py)."""
    heads = getattr(hf_obj, "alignment_heads", None)
    if heads is None and hasattr(hf_obj, "generation_config"):
        heads = getattr(hf_obj.generation_config, "alignment_heads", None)
    if not heads:
        return None
    return tuple((int(l), int(h)) for l, h in heads)
