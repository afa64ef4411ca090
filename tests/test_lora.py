"""LoRA adapter bank: init/apply/merge/stack/save-load semantics
(capability parity with /root/reference/src/models/whisper_lora.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.models import lora as lora_lib
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _mel(rng, B, cfg):
    return jnp.asarray(rng.standard_normal((B, cfg.num_mel_bins, cfg.max_source_positions * 2)),
                       jnp.float32)


def _randomize_b(bank, key):
    """LoRA init has B=0 (zero delta); fill B with noise to make deltas real."""
    leaves, treedef = jax.tree.flatten(bank)
    keys = jax.random.split(key, len(leaves))
    new = [jax.random.normal(k, l.shape, l.dtype) * 0.1 for k, l in zip(keys, leaves)]
    return jax.tree.unflatten(treedef, new)


def test_zero_init_delta(setup, rng):
    cfg, params = setup
    lcfg = lora_lib.LoraConfig(r=4, alpha=8)
    bank = lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg)
    mel = _mel(rng, 2, cfg)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    base = whisper.forward(params, mel, tokens, cfg)
    with_lora = whisper.forward(params, mel, tokens, cfg, lora=bank,
                                lora_scale=lcfg.scale)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_merge_matches_runtime_delta(setup, rng):
    cfg, params = setup
    lcfg = lora_lib.LoraConfig(r=4, alpha=8)
    bank = _randomize_b(lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg),
                        jax.random.PRNGKey(2))
    mel = _mel(rng, 2, cfg)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    runtime = whisper.forward(params, mel, tokens, cfg, lora=bank,
                              lora_scale=lcfg.scale)
    merged = lora_lib.merge_lora(params, bank, lcfg)
    folded = whisper.forward(merged, mel, tokens, cfg)
    np.testing.assert_allclose(np.asarray(runtime), np.asarray(folded), atol=2e-4)


def test_bank_gather_routes_per_sample(setup, rng):
    """One batch mixing adapters must equal per-adapter single runs (the BGMV
    replacing adapter_router.py:599-625's host loop)."""
    cfg, params = setup
    lcfg = lora_lib.LoraConfig(r=4, alpha=8)
    b0 = _randomize_b(lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg),
                      jax.random.PRNGKey(2))
    b1 = _randomize_b(lora_lib.init_lora(jax.random.PRNGKey(3), cfg, lcfg),
                      jax.random.PRNGKey(4))
    bank = lora_lib.stack_adapters([b0, b1])
    assert lora_lib.num_adapters(bank) == 2

    mel = _mel(rng, 2, cfg)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    idx = jnp.asarray([0, 1], jnp.int32)
    mixed = whisper.forward(params, mel, tokens, cfg, lora=bank,
                            adapter_idx=idx, lora_scale=lcfg.scale)
    only0 = whisper.forward(params, mel, tokens, cfg, lora=b0, lora_scale=lcfg.scale)
    only1 = whisper.forward(params, mel, tokens, cfg, lora=b1, lora_scale=lcfg.scale)
    np.testing.assert_allclose(np.asarray(mixed[0]), np.asarray(only0[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mixed[1]), np.asarray(only1[1]), atol=1e-4)


def test_stack_mixed_ranks_preserves_delta(setup, rng):
    cfg, params = setup
    l4 = lora_lib.LoraConfig(r=4, alpha=8)
    l8 = lora_lib.LoraConfig(r=8, alpha=16)
    b_r4 = _randomize_b(lora_lib.init_lora(jax.random.PRNGKey(1), cfg, l4),
                        jax.random.PRNGKey(2))
    b_r8 = _randomize_b(lora_lib.init_lora(jax.random.PRNGKey(3), cfg, l8),
                        jax.random.PRNGKey(4))
    bank = lora_lib.stack_adapters([b_r4, b_r8])
    assert jax.tree.leaves(bank)[0].shape[-1] == 8  # padded to max rank

    mel = _mel(rng, 1, cfg)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 5)), jnp.int32)
    # NOTE scale differs per adapter config; both are alpha/r = 2.0 here.
    single = whisper.forward(params, mel, tokens, cfg, lora=b_r4, lora_scale=2.0)
    via_bank = whisper.forward(params, mel, tokens, cfg, lora=bank,
                               adapter_idx=jnp.asarray([0]), lora_scale=2.0)
    np.testing.assert_allclose(np.asarray(single), np.asarray(via_bank), atol=1e-4)


def test_save_load_roundtrip(tmp_path, setup):
    cfg, _ = setup
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, target_modules=("q_proj", "v_proj"))
    bank = lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg)
    lora_lib.save_adapter(tmp_path / "adapter", bank, lcfg,
                          metadata={"language": "hindi", "model": "whisper-test"})
    loaded, loaded_cfg, meta = lora_lib.load_adapter(tmp_path / "adapter")
    assert loaded_cfg == lcfg
    assert meta["language"] == "hindi"
    for a, b in zip(jax.tree.leaves(bank), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dropout_zero_at_eval_nonzero_at_train(setup, rng):
    cfg, params = setup
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.5)
    bank = _randomize_b(lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg),
                        jax.random.PRNGKey(2))
    mel = _mel(rng, 1, cfg)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 5)), jnp.int32)
    eval_out = whisper.forward(params, mel, tokens, cfg, lora=bank, lora_scale=2.0)
    train_out = whisper.forward(params, mel, tokens, cfg, lora=bank, lora_scale=2.0,
                                lora_dropout=0.5, dropout_rng=jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out), atol=1e-6)


def test_trainable_summary(setup):
    cfg, params = setup
    lcfg = lora_lib.LoraConfig(r=4, alpha=8)
    bank = lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg)
    s = lora_lib.trainable_summary(bank, params)
    assert 0 < s["trainable_percent"] < 50
