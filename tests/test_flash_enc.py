"""Head-minor encoder attention kernel: interpret-mode parity vs the exact
jnp attention (whisper.attention on split heads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.models import whisper
from sar_tpu.ops.flash_enc import encoder_attention_hm

B, H, hd, T_VALID, T_PAD = 2, 4, 16, 50, 64
D = H * hd


@pytest.fixture(scope="module")
def qkv(rng=np.random.default_rng(5)):
    def mk():
        x = rng.standard_normal((B, T_PAD, D)).astype(np.float32)
        x[:, T_VALID:] = 0.0
        return jnp.asarray(x)
    return mk(), mk(), mk()


def test_kernel_matches_exact_attention(qkv):
    q, k, v = qkv
    got = encoder_attention_hm(q, k, v, n_heads=H, t_valid=T_VALID,
                               interpret=True)
    mask = (jnp.arange(T_PAD) < T_VALID)[None, None, None]
    want = whisper.attention(whisper.split_heads(q, H),
                             whisper.split_heads(k, H),
                             whisper.split_heads(v, H), mask)
    want = whisper.merge_heads(want)
    np.testing.assert_allclose(np.asarray(got[:, :T_VALID]),
                               np.asarray(want[:, :T_VALID]),
                               rtol=2e-5, atol=2e-5)


def test_padded_rows_do_not_contaminate(qkv):
    """Garbage in padded QUERY rows must not change valid rows' outputs."""
    q, k, v = qkv
    q2 = q.at[:, T_VALID:].set(1e3)
    a = encoder_attention_hm(q, k, v, n_heads=H, t_valid=T_VALID,
                             interpret=True)
    b = encoder_attention_hm(q2, k, v, n_heads=H, t_valid=T_VALID,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(a[:, :T_VALID]),
                                  np.asarray(b[:, :T_VALID]))
