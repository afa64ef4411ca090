"""HF Whisper checkpoint -> sar_tpu pytree converter.

The reference loads weights with transformers' from_pretrained
(/root/reference/src/models/base.py:77-131). Here the torch checkpoint is a
one-time import format: weights are transposed to [d_in, d_out], conv kernels
to [k, in, out], and per-layer tensors stacked on a leading [L, ...] axis for
lax.scan. Works offline from a state_dict or an in-memory HF model (used by
the parity tests with random-init tiny configs).
"""

from __future__ import annotations

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
    )
