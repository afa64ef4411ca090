"""Fused cross-KV projection+quantize kernel: interpret-mode parity.

The kernel (ops/kv_init.py) must reproduce whisper.init_cache's jnp
head-minor body bit-compatibly: same GEMM rounding (fp32 accumulation ->
compute dtype), same whisper.quantize_kv math per (row, head), same padded
layout (values 0 / scales 0 past t_valid) — including the column-grouped
(G > 1, whisper-large) plan and the per-sample cross_v LoRA delta
(adapted/routed decode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.models import whisper
from sar_tpu.models.config import get_config
from sar_tpu.ops import kv_init as ki
from sar_tpu.ops.kv_init import (fused_kv_init, fused_kv_init_supported,
                                 _pick_plan)

L, B, H, hd, S, S_pad = 2, 2, 4, 64, 100, 128
D = H * hd


@pytest.fixture(scope="module")
def setup(rng=np.random.default_rng(23)):
    enc = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((L, D, D)) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((L, D, D)) * 0.05, jnp.float32)
    bv = jnp.asarray(rng.standard_normal((L, D)) * 0.05, jnp.float32)
    return enc, wk, wv, bv


def _jnp_body(enc, wk, wv, bv, lora=None):
    """The init_cache head-minor scan body, inlined for one call. `lora` =
    (a [L, A, d, r], b [L, A, r, d], idx [B], scale) applies the production
    whisper.lora_delta to the V projection (the cross_v adapter hook)."""
    ck, cks, cv, cvs = [], [], [], []
    for l in range(L):
        k = jnp.dot(enc, wk[l], preferred_element_type=enc.dtype)
        v = jnp.dot(enc, wv[l], preferred_element_type=enc.dtype) + bv[l]
        if lora is not None:
            a, b, idx, scale = lora
            ctx = whisper.LoraCtx(idx, scale)
            v = v + whisper.lora_delta(enc, a[l], b[l], ctx, 6)
        kq, ks = whisper.quantize_kv(k.reshape(B, S, H, hd))
        vq, vs = whisper.quantize_kv(v.reshape(B, S, H, hd))
        ck.append(kq.reshape(B, S, D))
        cks.append(ks.transpose(0, 2, 1))
        cv.append(vq.reshape(B, S, D))
        cvs.append(vs.transpose(0, 2, 1))
    pad = S_pad - S
    ck = jnp.pad(jnp.stack(ck), [(0, 0), (0, 0), (0, pad), (0, 0)])
    cv = jnp.pad(jnp.stack(cv), [(0, 0), (0, 0), (0, pad), (0, 0)])
    cks = jnp.pad(jnp.stack(cks), [(0, 0), (0, 0), (0, 0), (0, pad)])
    cvs = jnp.pad(jnp.stack(cvs), [(0, 0), (0, 0), (0, 0), (0, pad)])
    return ck, cks, cv, cvs


def _assert_matches(got, want):
    for g, w, name in zip(got, want, ("kq", "ks", "vq", "vs")):
        g, w = np.asarray(g), np.asarray(w)
        assert g.shape == w.shape, name
        if g.dtype == np.int8:
            # Quantized values may differ by 1 ulp where the division sits
            # exactly on a rounding boundary in a different association.
            assert np.abs(g.astype(np.int32) - w.astype(np.int32)).max() <= 1
            assert (g != w).mean() < 5e-3, name
        else:
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-7,
                                       err_msg=name)


def test_kernel_matches_jnp_body(setup):
    enc, wk, wv, bv = setup
    enc_pad = jnp.pad(enc, [(0, 0), (0, S_pad - S), (0, 0)])
    got = fused_kv_init(enc_pad, wk, wv, bv, n_heads=H, t_valid=S,
                        interpret=True)
    _assert_matches(got, _jnp_body(enc, wk, wv, bv))


def test_kernel_matches_jnp_body_grouped(setup, monkeypatch):
    """Column-grouped plan (G=2, the whisper-large shape strategy), forced
    by shrinking the VMEM budget below the G=1 resident set."""
    enc, wk, wv, bv = setup
    assert ki._vmem_bytes(128, D, D, 0) > 700_000 > ki._vmem_bytes(128, D, D // 2, 0)
    monkeypatch.setattr(ki, "VMEM_BUDGET", 700_000)
    assert _pick_plan(S_pad, D, H) == (128, 2)
    enc_pad = jnp.pad(enc, [(0, 0), (0, S_pad - S), (0, 0)])
    got = fused_kv_init(enc_pad, wk, wv, bv, n_heads=H, t_valid=S,
                        interpret=True)
    _assert_matches(got, _jnp_body(enc, wk, wv, bv))


@pytest.mark.parametrize("shared", [False, True])
def test_kernel_lora_delta_matches_jnp_body(setup, shared):
    """Per-sample cross_v LoRA delta (adapted/routed decode): kernel vs the
    production whisper.lora_delta math. `shared` exercises the broadcast
    [L, 1, d, r] single-adapter slices."""
    enc, wk, wv, bv = setup
    rng = np.random.default_rng(7)
    A, r, scale = (1 if shared else 3), 8, 2.0
    a = jnp.asarray(rng.standard_normal((L, A, D, r)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((L, A, r, D)) * 0.1, jnp.float32)
    idx = jnp.zeros((B,), jnp.int32) if shared else jnp.asarray([2, 1], jnp.int32)
    va = a[:, :1] if shared else a[:, idx]
    vb = b[:, :1] if shared else b[:, idx]
    enc_pad = jnp.pad(enc, [(0, 0), (0, S_pad - S), (0, 0)])
    got = fused_kv_init(enc_pad, wk, wv, bv, n_heads=H, t_valid=S,
                        va=va, vb=vb, lora_scale=scale, interpret=True)
    _assert_matches(got, _jnp_body(enc, wk, wv, bv, lora=(a, b, idx, scale)))


def test_padding_rows_are_masked(setup):
    enc, wk, wv, bv = setup
    enc_pad = jnp.pad(enc, [(0, 0), (0, S_pad - S), (0, 0)])
    kq, ks, vq, vs = fused_kv_init(enc_pad, wk, wv, bv, n_heads=H,
                                   t_valid=S, interpret=True)
    assert np.all(np.asarray(kq)[:, :, S:] == 0)
    assert np.all(np.asarray(vq)[:, :, S:] == 0)       # v bias masked too
    assert np.all(np.asarray(ks)[..., S:] == 0.0)
    assert np.all(np.asarray(vs)[..., S:] == 0.0)
    assert np.all(np.asarray(ks)[..., :S] > 0.0)       # real scales positive


def test_supported_gate():
    assert fused_kv_init_supported(1536, 768, 12)      # whisper-small
    assert fused_kv_init_supported(1536, 1024, 16)     # whisper-medium
    assert fused_kv_init_supported(1536, 1280, 20)     # large: G=2 plan
    assert _pick_plan(1536, 1280, 20)[1] == 2          # column-grouped
    assert _pick_plan(1536, 1280, 20, 16) is not None  # ...with LoRA resident
    assert not fused_kv_init_supported(1500, 768, 12)  # unaligned S
    assert _pick_plan(1536, 768, 12)[0] in (128, 256, 384, 512)
    assert _pick_plan(1536, 768, 12)[1] == 1


def test_init_cache_fused_matches_jnp_body(monkeypatch):
    """init_cache must produce identical caches through the fused kernel
    (interpret mode, forced on) and the jnp scan body — with and without an
    adapted (cross_v LoRA) bank."""
    import dataclasses

    from sar_tpu.models import lora as lora_lib

    # whisper-test is too narrow for the kernel (d_model 64 < the 128-lane
    # tile); this config is the smallest kernel-legal shape.
    cfg = dataclasses.replace(get_config("whisper-test"),
                              name="kv-init-test", d_model=128,
                              encoder_heads=2, decoder_heads=2)
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(
        jax.random.PRNGKey(1),
        (2, cfg.num_mel_bins, cfg.max_source_positions * 2))
    enc = whisper.encode(params, mel, cfg)
    total = 16
    assert ki.fused_kv_init_supported(
        whisper.cross_pad_len(enc.shape[1]), enc.shape[2],
        cfg.decoder_heads)

    lcfg = lora_lib.LoraConfig(r=4, alpha=8)
    bank = lora_lib.stack_adapters(
        [lora_lib.init_lora(jax.random.PRNGKey(i + 2), cfg, lcfg)
         for i in range(2)])
    bank = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(9), x.shape) * 0.1,
        bank)
    idx = jnp.asarray([1, 0], jnp.int32)

    cases = [dict(), dict(lora=bank, adapter_idx=idx, lora_scale=lcfg.scale)]
    refs = [whisper.init_cache(params, enc, cfg, max_len=total,
                               cross_kv_int8=True, self_kv_int8=True,
                               head_minor=True, **kw) for kw in cases]

    # Force the fused path on CPU by faking the backend check and running
    # the kernel in interpret mode.
    real = ki.fused_kv_init

    def interp(*args, **kw):
        kw["interpret"] = True
        return real(*args, **kw)

    monkeypatch.setattr(ki, "fused_kv_init", interp)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for kw, ref in zip(cases, refs):
        fused = whisper.init_cache(params, enc, cfg, max_len=total,
                                   cross_kv_int8=True, self_kv_int8=True,
                                   head_minor=True, **kw)
        np.testing.assert_allclose(np.asarray(fused.cross_k_scale),
                                   np.asarray(ref.cross_k_scale),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(fused.cross_v_scale),
                                   np.asarray(ref.cross_v_scale),
                                   rtol=1e-5, atol=1e-7)
        dk = np.abs(np.asarray(fused.cross_k, np.int32)
                    - np.asarray(ref.cross_k, np.int32))
        dv = np.abs(np.asarray(fused.cross_v, np.int32)
                    - np.asarray(ref.cross_v, np.int32))
        assert dk.max() <= 1 and (dk != 0).mean() < 5e-3
        assert dv.max() <= 1 and (dv != 0).mean() < 5e-3
