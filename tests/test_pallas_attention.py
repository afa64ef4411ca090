"""Pallas flash-decode attention kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.ops.attic.attention import decode_attention, decode_attention_reference


@pytest.fixture(scope="module")
def qkv(rng):
    B, H, S, hd = 2, 4, 64, 64
    q = jnp.asarray(rng.standard_normal((B, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, hd)), jnp.float32)
    return q, k, v


def test_full_attention_parity(qkv):
    q, k, v = qkv
    out = decode_attention(q, k, v, interpret=True)
    ref = decode_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("valid", [1, 17, 64])
def test_masked_attention_parity(qkv, valid):
    q, k, v = qkv
    out = decode_attention(q, k, v, valid_len=jnp.int32(valid), interpret=True)
    ref = decode_attention_reference(q, k, v, valid_len=jnp.int32(valid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mask_excludes_tail(qkv):
    """Positions >= valid_len must not influence the output."""
    q, k, v = qkv
    k2 = k.at[:, :, 20:, :].set(999.0)
    v2 = v.at[:, :, 20:, :].set(-999.0)
    a = decode_attention(q, k, v, valid_len=jnp.int32(20), interpret=True)
    b = decode_attention(q, k2, v2, valid_len=jnp.int32(20), interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
