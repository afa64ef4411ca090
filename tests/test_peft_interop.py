"""PEFT adapter-checkpoint interop: sar_tpu must be able to evaluate the
reference's own trained adapters.

The reference saves adapters with PEFT save_pretrained
(/root/reference/src/models/whisper_lora.py:207-232) and reloads them with
PeftModel.from_pretrained (:283-321). These tests round-trip an actual
peft.get_peft_model on a tiny random Whisper through that exact save format
and assert our imported bank reproduces the PEFT forward logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sar_tpu.models import convert, whisper
from sar_tpu.models import lora as lora_lib

from _hf_tiny import (make_tiny_model, peft_wrap, randomize_peft_lora,
                      synth_mels, tiny_hf_config)

EOS, SOT = 3, 4


@pytest.fixture(scope="module")
def tiny_peft():
    hf_cfg = tiny_hf_config(vocab_size=256, eos=EOS, sot=SOT)
    model = make_tiny_model(hf_cfg, seed=5)
    cfg = convert.config_from_hf(hf_cfg)
    params = jax.tree.map(jnp.asarray, convert.from_hf_model(model, cfg))
    pm = peft_wrap(model, r=4, alpha=8)
    randomize_peft_lora(pm, seed=7)
    return hf_cfg, cfg, params, pm


def _peft_logits(pm, mel, dec_ids):
    with torch.no_grad():
        out = pm(input_features=torch.from_numpy(mel),
                 decoder_input_ids=torch.tensor(dec_ids, dtype=torch.long))
    return np.asarray(out.logits, np.float32)


def _our_logits(cfg, params, bank, lcfg, mel, dec_ids):
    logits = whisper.forward(params, jnp.asarray(mel),
                             jnp.asarray(dec_ids, jnp.int32), cfg,
                             lora=bank, lora_scale=lcfg.scale)
    return np.asarray(logits, np.float32)


def test_peft_roundtrip_logits_parity(tiny_peft, tmp_path):
    """save_pretrained -> lora_from_peft -> logits match the PEFT forward."""
    hf_cfg, cfg, params, pm = tiny_peft
    pm.save_pretrained(tmp_path)
    # The reference's save format: adapter_config.json + safetensors.
    adapter_dir = tmp_path / "default" if (tmp_path / "default").exists() else tmp_path
    assert (adapter_dir / "adapter_config.json").exists()
    assert convert.is_peft_checkpoint(adapter_dir)

    bank, lcfg = convert.lora_from_peft(adapter_dir, cfg)
    assert lcfg.r == 4 and lcfg.alpha == 8
    assert lora_lib.num_adapters(bank) == 1
    # q/v on encoder self, decoder self AND decoder cross — PEFT matches all
    # modules named q_proj/v_proj, so the import must cover all three.
    assert set(bank["encoder"]) == {"q", "v"}
    assert set(bank["decoder"]) == {"self_q", "self_v", "cross_q", "cross_v"}

    mel = synth_mels(3, 2, hf_cfg)
    dec = [[SOT, 10, 20, 30], [SOT, 7, 9, 11]]
    theirs = _peft_logits(pm, mel, dec)
    ours = _our_logits(cfg, params, jax.tree.map(jnp.asarray, bank), lcfg,
                       mel, dec)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)
    # And the delta is genuinely nonzero (guards against a silently-empty bank).
    base = _our_logits(cfg, params, None, lcfg, mel, dec)
    assert np.abs(ours - base).max() > 1e-3


def test_load_any_adapter_dispatch(tiny_peft, tmp_path):
    """load_any_adapter reads both our npz format and PEFT directories."""
    hf_cfg, cfg, params, pm = tiny_peft
    pm.save_pretrained(tmp_path / "peft")
    bank_p, lcfg_p, meta = lora_lib.load_any_adapter(tmp_path / "peft", cfg)
    assert meta.get("format") == "peft"

    lora_lib.save_adapter(tmp_path / "ours", bank_p, lcfg_p)
    bank_n, lcfg_n, _ = lora_lib.load_any_adapter(tmp_path / "ours", cfg)
    assert lcfg_n.r == lcfg_p.r
    for a, b in zip(jax.tree.leaves(bank_p), jax.tree.leaves(bank_n)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_peft_state_dict_inmemory_keys(tiny_peft):
    """The in-memory state_dict spells keys with the adapter name
    (lora_A.default.weight); the importer handles both spellings."""
    hf_cfg, cfg, params, pm = tiny_peft
    sd = {k: v for k, v in pm.state_dict().items() if "lora_" in k}
    assert any(".default." in k for k in sd)
    bank = convert.lora_from_peft_state_dict(sd, cfg)
    assert set(bank["decoder"]) == {"self_q", "self_v", "cross_q", "cross_v"}

    mel = synth_mels(11, 2, hf_cfg)
    dec = [[SOT, 5, 6], [SOT, 8, 2]]
    theirs = _peft_logits(pm, mel, dec)
    lcfg = lora_lib.LoraConfig(r=4, alpha=8)
    ours = _our_logits(cfg, params, jax.tree.map(jnp.asarray, bank), lcfg,
                       mel, dec)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)


def test_peft_import_rejects_mixed_ranks(tiny_peft):
    hf_cfg, cfg, *_ = tiny_peft
    d = hf_cfg.d_model
    sd = {
        "base_model.model.model.encoder.layers.0.self_attn.q_proj.lora_A.weight":
            np.zeros((4, d), np.float32),
        "base_model.model.model.encoder.layers.0.self_attn.q_proj.lora_B.weight":
            np.zeros((d, 4), np.float32),
        "base_model.model.model.encoder.layers.1.self_attn.q_proj.lora_A.weight":
            np.zeros((8, d), np.float32),
        "base_model.model.model.encoder.layers.1.self_attn.q_proj.lora_B.weight":
            np.zeros((d, 8), np.float32),
    }
    with pytest.raises(ValueError, match="mixed LoRA ranks"):
        convert.lora_from_peft_state_dict(sd, cfg)


def test_peft_import_rejects_non_lora_options(tiny_peft, tmp_path):
    import json
    hf_cfg, cfg, params, pm = tiny_peft
    pm.save_pretrained(tmp_path)
    cfg_path = tmp_path / "adapter_config.json"
    pcfg = json.loads(cfg_path.read_text())
    pcfg["use_rslora"] = True
    cfg_path.write_text(json.dumps(pcfg))
    with pytest.raises(ValueError, match="use_rslora"):
        convert.lora_from_peft(tmp_path, cfg)


def test_peft_import_merges_match(tiny_peft, tmp_path):
    """merge_lora on an imported bank == PEFT merge_and_unload weights."""
    hf_cfg, cfg, params, pm = tiny_peft
    pm.save_pretrained(tmp_path)
    bank, lcfg = convert.lora_from_peft(tmp_path, cfg)
    merged_ours = lora_lib.merge_lora(
        params, jax.tree.map(jnp.asarray, bank), lcfg)

    import copy
    merged_ref = copy.deepcopy(pm).merge_and_unload()
    merged_params = convert.from_hf_model(
        merged_ref, cfg)
    for name in ("q", "v"):
        np.testing.assert_allclose(
            np.asarray(merged_ours["encoder"]["layers"][name]["w"]),
            merged_params["encoder"]["layers"][name]["w"], atol=1e-5)
    for name in ("self_q", "self_v", "cross_q", "cross_v"):
        np.testing.assert_allclose(
            np.asarray(merged_ours["decoder"]["layers"][name]["w"]),
            merged_params["decoder"]["layers"][name]["w"], atol=1e-5)
