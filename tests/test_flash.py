"""Flash (blockwise Pallas) attention: numerical parity with the jnp path —
forward and backward — in interpret mode, including the non-tile-aligned
padding + segment-id masking that Whisper's 1500-position encoder needs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sar_tpu.models import whisper
from sar_tpu.models.config import get_config
from sar_tpu.ops.flash import flash_mha


def _qkv(rng, B, H, Tq, Tk, hd, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, H, Tq, hd)), dtype) * hd ** -0.5
    k = jnp.asarray(rng.standard_normal((B, H, Tk, hd)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, Tk, hd)), dtype)
    return q, k, v


def _ref(q, k, v, causal):
    mask = None
    if causal:
        Tq, Tk = q.shape[2], k.shape[2]
        mask = jnp.tril(jnp.ones((Tq, Tk), bool))[None, None]
    return whisper.attention(q, k, v, mask)


@pytest.mark.parametrize("Tq,Tk,causal", [
    (128, 128, False),       # tile-aligned
    (100, 100, True),        # padded, causal (decoder self-attention shape)
    (100, 300, False),       # padded, rectangular (cross-attention shape)
])
def test_flash_forward_parity(rng, Tq, Tk, causal):
    q, k, v = _qkv(rng, 2, 3, Tq, Tk, 32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_mha(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v, causal)),
                               atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_backward_parity(rng, causal):
    q, k, v = _qkv(rng, 1, 2, 100, 100, 32)
    w = jnp.asarray(rng.standard_normal((1, 2, 100, 32)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=causal) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, causal) * w)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=f"d{name} mismatch")


def test_whisper_forward_flash_matches(rng):
    """Full teacher-forced forward with flash attention everywhere (encoder
    self, decoder self-causal, decoder cross) == the jnp path."""
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    base = whisper.forward(params, mel, tokens, cfg)
    with pltpu.force_tpu_interpret_mode():
        fl = whisper.forward(params, mel, tokens, cfg, flash=True)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(base), atol=2e-4)


def test_whisper_grad_flash_matches(rng):
    """LoRA gradients with flash attention == jnp-path gradients."""
    from sar_tpu.models import lora as lora_lib
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    lcfg = lora_lib.LoraConfig(r=4, alpha=8, dropout=0.0)
    lora = lora_lib.init_lora(jax.random.PRNGKey(1), cfg, lcfg)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)), jnp.float32)
    labels = jnp.asarray(rng.integers(10, 200, (2, 6)), jnp.int32)

    def loss(lora, flash):
        dec_in = whisper.shift_tokens_right(labels, cfg.sot_token_id,
                                            cfg.pad_token_id)
        logits = whisper.forward(params, mel, dec_in, cfg, lora=lora,
                                 lora_scale=lcfg.scale, flash=flash)
        return whisper.cross_entropy_loss(logits, labels)

    g_base = jax.grad(lambda l: loss(l, False))(lora)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(lambda l: loss(l, True))(lora)
    for a, b in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_flash)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
