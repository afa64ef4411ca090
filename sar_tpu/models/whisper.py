"""Whisper encoder/decoder in pure JAX — TPU-first design.

Capability parity with the reference's model substrate (HF
WhisperForConditionalGeneration used via /root/reference/src/models/base.py
and whisper_lora.py), re-designed for XLA:

- Parameters are pytrees of arrays; per-stack layer weights are STACKED on a
  leading [L, ...] axis and iterated with `lax.scan` (fast compiles, natural
  rematerialisation, and a home for the stacked LoRA adapter bank).
- LoRA is not a module wrapper (the reference wraps with PEFT,
  whisper_lora.py:88-98); it is a first-class hook in the attention
  projections: every q/v projection accepts an optional [L, A, d, r] adapter
  bank plus a per-utterance adapter index, computing the low-rank delta as a
  batched gathered GEMM (BGMV) so a single batch can mix languages.
- Teacher-forced forward for training; KV-cached single-token step for
  decoding (driven by `lax.while_loop` in sar_tpu.decode).
- LayerNorm/softmax in float32; matmuls in the params' dtype (bf16 on TPU).

Weight convention: linear weights are [d_in, d_out] (y = x @ w + b).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sar_tpu.models.config import WhisperConfig

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def linear(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    y = jnp.dot(x, p["w"], preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


class LoraCtx(NamedTuple):
    """Runtime context for LoRA application, threaded through the layer scan.

    adapter_idx: [B] int32 per-utterance adapter selection, or None for the
    single-adapter fast path (no gather). scale = alpha / r. dropout/rng
    implement the reference's lora_dropout (whisper_lora.py:86-94 defaults
    dropout=0.1) as inverted dropout on the LoRA branch input.
    """
    adapter_idx: Any = None
    scale: float = 1.0
    dropout: float = 0.0
    rng: Any = None


def lora_delta(x: jnp.ndarray, la: jnp.ndarray, lb: jnp.ndarray,
               ctx: LoraCtx, salt: int) -> jnp.ndarray:
    """Low-rank delta `scale * (x @ A) @ B` with per-utterance adapter routing.

    la: [A, d_in, r], lb: [A, r, d_out] (the adapter bank for one layer/target;
    the leading stack axis is consumed by lax.scan). x: [B, T, d_in].

    This is the batched BGMV that replaces the reference's per-sample Python
    dispatch loop (/root/reference/src/models/adapter_router.py:599-625).

    Routing is MASKED-DENSE, not gathered: x is contracted against ALL A
    adapters as one [d_in, A*r] GEMM, the non-selected rank blocks are zeroed
    with a one-hot mask, and the result contracts through the flattened
    [A*r, d_out] B bank — two dense MXU GEMMs and a VPU multiply. The earlier
    per-sample gather (`la[adapter_idx] -> [B, d, r]` + batched [1, d]x[d, r]
    GEMMs) re-materialized ~300 MB of gathered slices per decode step at
    whisper-small B=128 r=16 and fed the MXU degenerate single-row batched
    matmuls — it measured 2.7x slower end-to-end than unadapted decode
    (ROUTED_BENCH r04). With A = n_languages (4), the extra A*x FLOPs of the
    dense form are noise next to the base projections. Zeroing after the
    first GEMM keeps per-sample numerics equal to the single-adapter path up
    to fp32-accumulation reassociation (masked blocks contribute exact +0.0).
    """
    if ctx.rng is not None and ctx.dropout > 0.0:
        keep = jax.random.bernoulli(jax.random.fold_in(ctx.rng, salt),
                                    1.0 - ctx.dropout, x.shape)
        x = x * keep.astype(x.dtype) / (1.0 - ctx.dropout)
    if ctx.adapter_idx is None:
        u = jnp.einsum("btd,dr->btr", x, la[0].astype(x.dtype))
        return ctx.scale * jnp.einsum("btr,rd->btd", u, lb[0].astype(x.dtype))
    A, d_in, r = la.shape
    B, T = x.shape[0], x.shape[1]
    laf = la.transpose(1, 0, 2).reshape(d_in, A * r).astype(x.dtype)
    lbf = lb.reshape(A * r, lb.shape[-1]).astype(x.dtype)
    u = jnp.einsum("btd,dc->btc", x, laf)                        # [B, T, A*r]
    sel = jax.nn.one_hot(ctx.adapter_idx, A, dtype=x.dtype)      # [B, A]
    u = (u.reshape(B, T, A, r) * sel[:, None, :, None]).reshape(B, T, A * r)
    return ctx.scale * jnp.einsum("btc,cd->btd", u, lbf)


def _proj(x: jnp.ndarray, p: Params, lora: Params | None,
          ctx: LoraCtx, salt: int = 0) -> jnp.ndarray:
    y = linear(x, p)
    if lora is not None:
        y = y + lora_delta(x, lora["a"], lora["b"], ctx, salt)
    return y


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    B, T, D = x.shape
    return x.reshape(B, T, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, T, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * hd)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Scaled dot-product attention over [B, H, T, hd]; softmax in fp32.

    `q` is expected pre-scaled by head_dim**-0.5 (applied at projection, like
    the substrate the reference relies on).
    """
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder position table."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, bias=True, std=0.02):
    kw, _ = jax.random.split(key)
    p = {"w": jax.random.normal(kw, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _init_enc_layer(key, cfg: WhisperConfig):
    ks = jax.random.split(key, 6)
    d, f = cfg.d_model, cfg.ffn_dim
    return {
        "attn_ln": _init_ln(d),
        "q": _init_linear(ks[0], d, d),
        "k": _init_linear(ks[1], d, d, bias=False),
        "v": _init_linear(ks[2], d, d),
        "o": _init_linear(ks[3], d, d),
        "mlp_ln": _init_ln(d),
        "fc1": _init_linear(ks[4], d, f),
        "fc2": _init_linear(ks[5], f, d),
    }


def _init_dec_layer(key, cfg: WhisperConfig):
    ks = jax.random.split(key, 10)
    d, f = cfg.d_model, cfg.ffn_dim
    return {
        "self_ln": _init_ln(d),
        "self_q": _init_linear(ks[0], d, d),
        "self_k": _init_linear(ks[1], d, d, bias=False),
        "self_v": _init_linear(ks[2], d, d),
        "self_o": _init_linear(ks[3], d, d),
        "cross_ln": _init_ln(d),
        "cross_q": _init_linear(ks[4], d, d),
        "cross_k": _init_linear(ks[5], d, d, bias=False),
        "cross_v": _init_linear(ks[6], d, d),
        "cross_o": _init_linear(ks[7], d, d),
        "mlp_ln": _init_ln(d),
        "fc1": _init_linear(ks[8], d, f),
        "fc2": _init_linear(ks[9], f, d),
    }


def init_params(key: jax.Array, cfg: WhisperConfig) -> Params:
    """Random-init full parameter pytree (tests / from-scratch training)."""
    k_enc, k_dec, k_tok, k_pos, kc1, kc2 = jax.random.split(key, 6)
    enc_layers = _stack([_init_enc_layer(k, cfg)
                         for k in jax.random.split(k_enc, cfg.encoder_layers)])
    dec_layers = _stack([_init_dec_layer(k, cfg)
                         for k in jax.random.split(k_dec, cfg.decoder_layers)])
    d = cfg.d_model
    return {
        "encoder": {
            "conv1": {"w": jax.random.normal(kc1, (3, cfg.num_mel_bins, d)) * 0.02,
                      "b": jnp.zeros((d,))},
            "conv2": {"w": jax.random.normal(kc2, (3, d, d)) * 0.02,
                      "b": jnp.zeros((d,))},
            "pos_embed": jnp.asarray(sinusoids(cfg.max_source_positions, d)),
            "layers": enc_layers,
            "ln": _init_ln(d),
        },
        "decoder": {
            "token_embed": jax.random.normal(k_tok, (cfg.vocab_size, d)) * 0.02,
            "pos_embed": jax.random.normal(k_pos, (cfg.max_target_positions, d)) * 0.02,
            "layers": dec_layers,
            "ln": _init_ln(d),
        },
    }


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def cast_params(params: Params, dtype) -> Params:
    """Cast matmul-heavy weights to `dtype`, keep LayerNorm params fp32."""
    def cast(path, x):
        if any(isinstance(p, jax.tree_util.DictKey)
               and p.key in ("attn_ln", "mlp_ln", "self_ln", "cross_ln", "ln")
               for p in path):
            return x
        return x.astype(dtype)
    return jax.tree_util.tree_map_with_path(cast, params)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _mha(q, k, v, mask=None, *, causal=False, flash=False):
    """Attention dispatch: the jnp path materializes [Tq, Tk] probs
    (mask/causal given explicitly); flash=True streams blockwise through the
    Pallas kernel (sar_tpu.ops.flash) and never materializes them. The flash
    output carries a checkpoint name so the selective remat policy can save
    it — the remat backward then never re-runs any attention forward."""
    if flash:
        from jax.ad_checkpoint import checkpoint_name
        from sar_tpu.ops.flash import flash_mha
        return checkpoint_name(flash_mha(q, k, v, causal=causal), "flash_out")
    return attention(q, k, v, mask)


def _enc_layer_apply(x, p, lora, ctx, num_heads, flash=False, t_valid=None):
    lo = lora or {}
    if flash == "fq" and not any(k in lo for k in ("q", "k", "v")):
        # Fused LN+QKV+attention kernel: h/q/k/v never exist in HBM (four
        # [B, T, D] round-trips per layer gone). LoRA on q/k/v needs the
        # unfused projections — encode() downgrades "fq" to "hm" then; LoRA
        # on the out-projection alone still composes (applied below).
        from sar_tpu.ops.flash_enc import encoder_attention_fused
        a_m = encoder_attention_fused(
            x, p["attn_ln"]["scale"], p["attn_ln"]["bias"],
            p["q"]["w"], p["q"]["b"], p["k"]["w"], p["v"]["w"], p["v"]["b"],
            n_heads=num_heads, t_valid=t_valid)
        x = x + _proj(a_m, p["o"], lo.get("o"), ctx, 3)
        h = layer_norm(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"])
        h = jax.nn.gelu(linear(h, p["fc1"]), approximate=False)
        return x + linear(h, p["fc2"])
    scaling = (x.shape[-1] // num_heads) ** -0.5
    h = layer_norm(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"])
    q = _proj(h, p["q"], lo.get("q"), ctx, 0) * scaling
    k = _proj(h, p["k"], lo.get("k"), ctx, 1)
    v = _proj(h, p["v"], lo.get("v"), ctx, 2)
    if flash in ("hm", "fq"):
        # Head-minor kernel consumes the residual-stream layout directly —
        # no split/merge transposes (and none of the relayout copies XLA
        # inserts between a transpose and a pallas_call). Inference-only
        # (no VJP); `x` is padded to the kernel's T and key columns
        # >= t_valid are masked inside.
        from sar_tpu.ops.flash_enc import encoder_attention_hm
        a_m = encoder_attention_hm(q, k, v, n_heads=num_heads,
                                   t_valid=t_valid)
    else:
        a = _mha(split_heads(q, num_heads), split_heads(k, num_heads),
                 split_heads(v, num_heads), flash=flash)
        a_m = merge_heads(a)
    x = x + _proj(a_m, p["o"], lo.get("o"), ctx, 3)
    h = layer_norm(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"])
    h = jax.nn.gelu(linear(h, p["fc1"]), approximate=False)
    x = x + linear(h, p["fc2"])
    return x


def _layer_ctx(ctx: LoraCtx, layer_idx) -> LoraCtx:
    if ctx.rng is None:
        return ctx
    return ctx._replace(rng=jax.random.fold_in(ctx.rng, layer_idx))


def _remat(body, remat, flash=False):
    """remat=True: selective checkpointing — plain matmuls (projections,
    FFN; dot_generals without batch dims) are saved, attention scores/probs
    (batched dots) are recomputed in the backward pass. This keeps training
    memory bounded (the non-remat backward materializes [T, T] attention
    probabilities per layer — 21 GB for whisper-small at batch 16) at a
    fraction of full-layer recompute. With flash attention the named
    "flash_out" tensors ([B, T, d]-sized, cheap) are saved too, so the
    backward recomputes only elementwise ops — no attention matmuls at all.
    remat="full" recomputes everything."""
    if remat == "full":
        return jax.checkpoint(body)
    if remat:
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        if flash:
            policy = jax.checkpoint_policies.save_from_both_policies(
                policy,
                jax.checkpoint_policies.save_only_these_names("flash_out"))
        return jax.checkpoint(body, policy=policy)
    return body


def encode(params: Params, mel: jnp.ndarray, cfg: WhisperConfig, *,
           lora: Params | None = None, adapter_idx: jnp.ndarray | None = None,
           lora_scale: float = 1.0, lora_dropout: float = 0.0,
           dropout_rng: jax.Array | None = None,
           remat: bool = False,
           flash: bool | str = False) -> jnp.ndarray:
    """Encoder forward. mel: [B, num_mel_bins, T_frames] -> [B, T/2, d].

    flash: False = exact jnp attention ([T, T] probs materialized);
    True = blockwise Pallas kernel (ops/flash.py, fwd + fused VJP — the
    training path); "hm" = head-minor forward kernel (ops/flash_enc.py,
    inference-only: no transposes around the kernel); "fq" = fused
    LN+QKV-projection+attention kernel (inference-only, exact — h/q/k/v
    never round-trip HBM). "fq" self-downgrades to "hm" when LoRA adapts
    q/k/v (the fused projections have no adapter path) or when the shape
    exceeds the kernel's VMEM budget."""
    enc = params["encoder"]
    x = mel.transpose(0, 2, 1)                                   # [B, T, M]
    dtype = enc["conv1"]["w"].dtype
    x = x.astype(dtype)

    x = jax.lax.conv_general_dilated(
        x, enc["conv1"]["w"].astype(dtype), window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC")) + enc["conv1"]["b"].astype(dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2"]["w"].astype(dtype), window_strides=(2,), padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC")) + enc["conv2"]["b"].astype(dtype)
    x = jax.nn.gelu(x, approximate=False)

    T = x.shape[1]
    x = x + enc["pos_embed"][:T].astype(dtype)

    ctx = LoraCtx(adapter_idx, lora_scale, lora_dropout, dropout_rng)
    enc_lora = lora.get("encoder") if lora else None

    if flash == "fq":
        from sar_tpu.ops.flash_enc import fused_qkv_supported
        lora_qkv = enc_lora is not None and any(
            k in enc_lora for k in ("q", "k", "v"))
        if lora_qkv or not fused_qkv_supported(cross_pad_len(T),
                                               x.shape[-1],
                                               cfg.encoder_heads):
            flash = "hm"

    pad = cross_pad_len(T) - T if flash in ("hm", "fq") else 0
    if pad:
        # The hm/fq kernels run on a 128-aligned T; padded rows carry
        # garbage that masked keys keep out of real rows, sliced at the end.
        x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])

    def body(carry, xs):
        p, lo, li = xs
        y = _enc_layer_apply(carry, p, lo, _layer_ctx(ctx, li),
                             cfg.encoder_heads, flash=flash, t_valid=T)
        return y, None

    body = _remat(body, remat, flash)
    x, _ = jax.lax.scan(body, x, (enc["layers"], enc_lora,
                                  jnp.arange(cfg.encoder_layers)))
    if pad:
        x = x[:, :T]
    return layer_norm(x, enc["ln"]["scale"], enc["ln"]["bias"])


# ---------------------------------------------------------------------------
# Decoder (teacher-forced)
# ---------------------------------------------------------------------------

def _dec_layer_apply(x, enc_out, p, lora, ctx, num_heads, causal_mask,
                     flash=False):
    scaling = (x.shape[-1] // num_heads) ** -0.5
    lo = lora or {}
    # Self-attention (causal).
    h = layer_norm(x, p["self_ln"]["scale"], p["self_ln"]["bias"])
    q = _proj(h, p["self_q"], lo.get("self_q"), ctx, 0) * scaling
    k = _proj(h, p["self_k"], lo.get("self_k"), ctx, 1)
    v = _proj(h, p["self_v"], lo.get("self_v"), ctx, 2)
    a = _mha(split_heads(q, num_heads), split_heads(k, num_heads),
             split_heads(v, num_heads), causal_mask, causal=True, flash=flash)
    x = x + _proj(merge_heads(a), p["self_o"], lo.get("self_o"), ctx, 3)
    # Cross-attention.
    h = layer_norm(x, p["cross_ln"]["scale"], p["cross_ln"]["bias"])
    q = _proj(h, p["cross_q"], lo.get("cross_q"), ctx, 4) * scaling
    k = _proj(enc_out, p["cross_k"], lo.get("cross_k"), ctx, 5)
    v = _proj(enc_out, p["cross_v"], lo.get("cross_v"), ctx, 6)
    a = _mha(split_heads(q, num_heads), split_heads(k, num_heads),
             split_heads(v, num_heads), flash=flash)
    x = x + _proj(merge_heads(a), p["cross_o"], lo.get("cross_o"), ctx, 7)
    # MLP.
    h = layer_norm(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"])
    h = jax.nn.gelu(linear(h, p["fc1"]), approximate=False)
    x = x + linear(h, p["fc2"])
    return x


def decode_train(params: Params, enc_out: jnp.ndarray, tokens: jnp.ndarray,
                 cfg: WhisperConfig, *, lora: Params | None = None,
                 adapter_idx: jnp.ndarray | None = None, lora_scale: float = 1.0,
                 lora_dropout: float = 0.0, dropout_rng: jax.Array | None = None,
                 remat: bool = False, flash: bool = False) -> jnp.ndarray:
    """Teacher-forced decoder forward. tokens: [B, T] -> logits [B, T, V] fp32."""
    dec = params["decoder"]
    dtype = enc_out.dtype
    T = tokens.shape[1]
    x = dec["token_embed"][tokens].astype(dtype) + dec["pos_embed"][:T].astype(dtype)
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
    ctx = LoraCtx(adapter_idx, lora_scale, lora_dropout, dropout_rng)
    dec_lora = lora.get("decoder") if lora else None

    def body(carry, xs):
        p, lo, li = xs
        y = _dec_layer_apply(carry, enc_out, p, lo, _layer_ctx(ctx, li),
                             cfg.decoder_heads, causal, flash=flash)
        return y, None

    body = _remat(body, remat, flash)
    x, _ = jax.lax.scan(body, x, (dec["layers"], dec_lora,
                                  jnp.arange(cfg.decoder_layers)))
    x = layer_norm(x, dec["ln"]["scale"], dec["ln"]["bias"])
    return jnp.dot(x, dec["token_embed"].T.astype(dtype),
                   preferred_element_type=jnp.float32)


def detect_language(params: Params, enc_out: jnp.ndarray,
                    cfg: WhisperConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-shot language ID from the model itself (openai-whisper's
    `detect_language`): the decoder sees only `<|sot|>` and the next-token
    distribution is renormalized over the language tokens. Returns
    (lang_index [B] int32 into WHISPER_LANGUAGES, probs [B, n_langs] fp32).

    Complementary to the trained LID classifier
    (sar_tpu/models/classifier.py — the reference's Phase-2 router signal):
    this needs no training but only works with real multilingual weights.
    """
    from sar_tpu.models.config import WHISPER_LANGUAGES
    B = enc_out.shape[0]
    sot = jnp.full((B, 1), cfg.sot_token_id, jnp.int32)
    logits = decode_train(params, enc_out, sot, cfg)[:, 0]
    n = min(len(WHISPER_LANGUAGES),
            cfg.vocab_size - cfg.lang_token_offset)
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits, cfg.lang_token_offset, n, axis=-1).astype(jnp.float32)
    probs = jax.nn.softmax(lang_logits, axis=-1)
    return jnp.argmax(probs, axis=-1).astype(jnp.int32), probs


def decode_cross_attn(params: Params, enc_out: jnp.ndarray,
                      tokens: jnp.ndarray, cfg: WhisperConfig, *,
                      heads: tuple[tuple[int, int], ...],
                      lora: Params | None = None,
                      adapter_idx: jnp.ndarray | None = None,
                      lora_scale: float = 1.0,
                      with_token_probs: bool = False) -> jnp.ndarray:
    """Teacher-forced decoder forward returning the cross-attention
    probabilities of the selected (layer, head) pairs: [B, len(heads), T, S]
    fp32, ordered like `heads`.

    `with_token_probs=True` additionally returns [B, T] fp32: the softmax
    probability of tokens[:, t+1] given the prefix (position T-1 gets 0) —
    the per-token confidence openai's find_alignment reads for word
    probabilities; it reuses this pass's activations (one extra logits
    matmul).

    The alignment capture for word-level timestamps (openai-whisper
    timing.find_alignment installs QK hooks; here the probs are first-class
    outputs of one jitted pass). Python-unrolled over layers — L is static
    and small, and unrolling keeps only the selected heads' maps live where
    a lax.scan would stack all L*H of them. The math mirrors
    _dec_layer_apply exactly (exact jnp attention; the flash kernels never
    materialize probabilities, so they cannot serve this path).
    """
    dec = params["decoder"]
    dtype = enc_out.dtype
    T = tokens.shape[1]
    x = dec["token_embed"][tokens].astype(dtype) + dec["pos_embed"][:T].astype(dtype)
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
    ctx = LoraCtx(adapter_idx, lora_scale, 0.0, None)
    dec_lora = lora.get("decoder") if lora else None
    H = cfg.decoder_heads
    scaling = (cfg.d_model // H) ** -0.5
    by_layer: dict[int, list[int]] = {}
    for idx, (l, h) in enumerate(heads):
        by_layer.setdefault(l, []).append((idx, h))
    captured: list[jnp.ndarray | None] = [None] * len(heads)
    for li in range(cfg.decoder_layers):
        p = jax.tree.map(lambda a, li=li: a[li], dec["layers"])
        lo = (jax.tree.map(lambda a, li=li: a[li], dec_lora)
              if dec_lora is not None else {})
        lctx = _layer_ctx(ctx, li)
        # Self-attention (causal) — identical to _dec_layer_apply.
        h_ = layer_norm(x, p["self_ln"]["scale"], p["self_ln"]["bias"])
        q = _proj(h_, p["self_q"], lo.get("self_q"), lctx, 0) * scaling
        k = _proj(h_, p["self_k"], lo.get("self_k"), lctx, 1)
        v = _proj(h_, p["self_v"], lo.get("self_v"), lctx, 2)
        a = _mha(split_heads(q, H), split_heads(k, H), split_heads(v, H),
                 causal, causal=True)
        x = x + _proj(merge_heads(a), p["self_o"], lo.get("self_o"), lctx, 3)
        # Cross-attention, probabilities captured.
        h_ = layer_norm(x, p["cross_ln"]["scale"], p["cross_ln"]["bias"])
        q = _proj(h_, p["cross_q"], lo.get("cross_q"), lctx, 4) * scaling
        k = _proj(enc_out, p["cross_k"], lo.get("cross_k"), lctx, 5)
        v = _proj(enc_out, p["cross_v"], lo.get("cross_v"), lctx, 6)
        qh, kh, vh = (split_heads(t, H) for t in (q, k, v))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        for idx, hh in by_layer.get(li, ()):
            captured[idx] = probs[:, hh]
        a = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(qh.dtype), vh)
        x = x + _proj(merge_heads(a), p["cross_o"], lo.get("cross_o"), lctx, 7)
        # MLP.
        h_ = layer_norm(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"])
        h_ = jax.nn.gelu(linear(h_, p["fc1"]), approximate=False)
        x = x + linear(h_, p["fc2"])
    maps = jnp.stack(captured, axis=1)
    if not with_token_probs:
        return maps
    xf = layer_norm(x, dec["ln"]["scale"], dec["ln"]["bias"])
    logits = jnp.dot(xf, dec["token_embed"].T.astype(dtype),
                     preferred_element_type=jnp.float32).astype(jnp.float32)
    # Gather-then-normalize: p = exp(logit - logsumexp) reads ONE logit per
    # position instead of materializing a second [B, T, V] softmax tensor
    # (~740 MB fp32 at whisper-large aligner shapes).
    nxt = jnp.concatenate([tokens[:, 1:], tokens[:, :1]], axis=1)
    chosen = jnp.take_along_axis(logits, nxt[..., None], axis=-1)[..., 0]
    tp = jnp.exp(chosen - jax.scipy.special.logsumexp(logits, axis=-1))
    tp = tp.at[:, -1].set(0.0)
    return maps, tp


def forward(params: Params, mel: jnp.ndarray, tokens: jnp.ndarray,
            cfg: WhisperConfig, *, dropout_rng: jax.Array | None = None,
            **kw) -> jnp.ndarray:
    """Full teacher-forced forward: mel + decoder input tokens -> logits."""
    enc_rng = dec_rng = None
    if dropout_rng is not None:
        enc_rng, dec_rng = jax.random.split(dropout_rng)
    enc_out = encode(params, mel, cfg, dropout_rng=enc_rng, **kw)
    return decode_train(params, enc_out, tokens, cfg, dropout_rng=dec_rng, **kw)


def shift_tokens_right(labels: jnp.ndarray, start_token_id: int,
                       pad_token_id: int) -> jnp.ndarray:
    """Build decoder inputs from labels: prepend SOT, drop last, -100 -> pad.

    Matches the substrate semantics the reference's collator relies on
    (/root/reference/src/data/collate.py:69-76: labels are -100-masked and
    BOS-stripped because the model re-prepends it).
    """
    inp = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), start_token_id, labels.dtype),
         labels[:, :-1]], axis=1)
    return jnp.where(inp == -100, pad_token_id, inp)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over non-(-100) positions (the reference's loss masking,
    /root/reference/src/data/collate.py:69-72)."""
    mask = labels != -100
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


# ---------------------------------------------------------------------------
# KV-cached decoding
# ---------------------------------------------------------------------------

def cross_pad_len(s: int) -> int:
    """Cross-cache S rounded up to the 128-lane tile (fused-kernel block)."""
    return -(-s // 128) * 128


class DecodeCache(NamedTuple):
    """Static-shape KV cache for autoregressive decode.

    Cross K/V may be int8-quantized with per-position (row) scales — decode
    is cross-KV-bandwidth-bound, and per-row scales factor exactly out of the
    attention math (scores_s = scale_s * q.k_s; out = sum_s (p_s*vscale_s)
    v_s), so int8 halves the dominant memory traffic with no change to the
    softmax structure.

    Cross K/V come in two layouts, told apart by cross_k.ndim:
    - classic [L, B, H, S, hd] (ndim 5): what the exact jnp einsum paths
      consume directly — the default.
    - HEAD-MINOR [L, B, S_pad, H*hd] (ndim 4, S padded to a 128-aligned
      S_pad, scales [L, B, H, S_pad], padded scales 0): one contiguous
      lane-aligned [S_pad, D] slab per sample — exactly what the fused
      s8-MXU Pallas decode kernel (ops/decode_cross.py) streams per grid
      cell with a static (layer, batch) BlockSpec offset, with NO per-layer
      slice/reshape buffer materialization. Built by
      init_cache(head_minor=True); this IS the default TPU decode layout
      (use_head_minor) — the exact-compute kernel
      (ops/decode_cross.cross_decode_attention_exact) consumes it on the
      default path and the s8-MXU kernel under `scores_int8`. It is not
      the CPU/mesh layout: XLA can only consume it by physically
      transposing each slab back per step (f32 576 MB temps at
      whisper-small B=128), and the kernels have no SPMD rule.
    The self cache is always classic [L, B, H, max_len, hd]: the fused
    head-minor self kernel exists (ops/attic/decode_self.py) but measured
    per-call-overhead-bound — see the note in init_cache.
    """
    self_k: jnp.ndarray    # [L, B, H, max_len, hd] (compute dtype or int8)
    self_v: jnp.ndarray
    cross_k: jnp.ndarray   # [L,B,H,S,hd] or head-minor [L,B,S_pad,H*hd]
    cross_v: jnp.ndarray
    cross_k_scale: jnp.ndarray | None = None  # [L,B,H,S] fp32 (int8 only)
    cross_v_scale: jnp.ndarray | None = None
    self_k_scale: jnp.ndarray | None = None   # [L, B, H, max_len] (int8 only)
    self_v_scale: jnp.ndarray | None = None


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8: x [.., S, hd] -> (int8 values, [.., S] scales)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def quantize_kv4(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int4, nibble-packed: x [.., S, hd] ->
    ([.., S, hd//2] int8 carrying two int4 lanes per byte, [.., S] scales).

    Packing is by contiguous HALVES of the row, not interleaved pairs: the
    low nibble of byte j holds lane j (x[..., :hd//2]) and the high nibble
    holds lane hd//2+j — so unpacking yields the two half-rows directly and
    an attention contraction splits into two half-width dots with NO lane
    shuffle (sum over d commutes with any fixed permutation). Native
    jnp.int4 is not used: S4 arrays cannot cross jit boundaries in this
    JAX/libtpu build and report unpacked nbytes (no traffic win)."""
    hd = x.shape[-1]
    if hd % 2:
        raise ValueError("int4 packing needs an even head_dim")
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -7, 7).astype(jnp.int8)
    lo = q[..., : hd // 2] & jnp.int8(15)        # two's-complement low nibble
    hi = q[..., hd // 2:] << jnp.int8(4)
    return (hi | lo), scale


def unpack_kv4(p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of quantize_kv4's packing: [.., hd//2] packed bytes ->
    (low-half lanes, high-half lanes), both int8 in [-7, 7]. Shifts on int8
    are arithmetic, so `(p << 4) >> 4` sign-extends the low nibble."""
    lo = (p << jnp.int8(4)) >> jnp.int8(4)
    hi = p >> jnp.int8(4)
    return lo, hi


def use_head_minor(*, cross_kv_int8: bool, self_kv_int8: bool,
                   cross_kv_int4: bool = False, self_kv_int4: bool = False,
                   scores_int8: bool = False, mesh=None) -> bool:
    """Pick the cross-KV cache layout for a decode path.

    Head-minor slabs ([L, B, S_pad, H*hd], DecodeCache docstring) feed the
    fused Pallas streaming kernels — the exact-compute default
    (ops/decode_cross.cross_decode_attention_exact) and the s8-MXU opt-in.
    They require a full int8 KV cache (the slabs ARE int8), don't compose
    with int4 packing, and the kernels have no SPMD rule (mesh decodes keep
    the classic layout, whose einsums XLA partitions). On CPU the layout is
    only chosen when scores_int8 explicitly asks for it (the jnp twins
    exist for tests; the classic einsum path is faster there)."""
    if mesh is not None:
        return False
    if not (cross_kv_int8 and self_kv_int8):
        return False
    if cross_kv_int4 or self_kv_int4:
        return False
    if scores_int8:
        return True
    return jax.default_backend() == "tpu"


def init_cache(params: Params, enc_out: jnp.ndarray, cfg: WhisperConfig,
               max_len: int, *, lora: Params | None = None,
               adapter_idx: jnp.ndarray | None = None,
               lora_scale: float = 1.0,
               cross_kv_int8: bool = False,
               self_kv_int8: bool = False,
               self_batch: int | None = None,
               head_minor: bool = False,
               cross_kv_int4: bool = False,
               self_kv_int4: bool = False) -> DecodeCache:
    """Precompute cross-attention K/V once per utterance and allocate the
    self-attention cache. The reference recomputes encoder states inside every
    generate call per sample (adapter_router.py:744-750); here they are
    computed once and reused across all decode steps.

    `self_batch` decouples the self-cache batch from the cross-KV batch:
    beam search keeps cross K/V at ONE copy per sample (shared across the
    sample's beams via `decode_step(beam_width=K)`) while the self cache
    holds B*K rows.

    `cross_kv_int4` / `self_kv_int4` (opt-in, implies the corresponding
    int8 flag's role): nibble-packed int4 values (quantize_kv4) — the
    packed axes are hd//2 wide, which is how decode_step tells the paths
    apart. Halves the quantized-KV HBM traffic again at ~2x the
    quantization error of int8 (15 levels/row); gated like scores_int8 on
    the agreement harness, never a silent default."""
    dec = params["decoder"]
    B, S = enc_out.shape[0], enc_out.shape[1]
    SB = self_batch if self_batch is not None else B
    H, hd = cfg.decoder_heads, cfg.d_model // cfg.decoder_heads
    dtype = enc_out.dtype
    ctx = LoraCtx(adapter_idx, lora_scale)

    def body(_, xs):
        p, lo = xs
        lo = lo or {}
        k = _proj(enc_out, p["cross_k"], lo.get("cross_k"), ctx, 5)
        v = _proj(enc_out, p["cross_v"], lo.get("cross_v"), ctx, 6)
        if head_minor:
            # [B, S, D]: the projection output as-is (no transpose) — see
            # the DecodeCache layout note. Scales head-major [B, H, S].
            kq, ks = quantize_kv(k.reshape(B, S, H, hd))
            vq, vs = quantize_kv(v.reshape(B, S, H, hd))
            return None, (kq.reshape(B, S, H * hd), ks.transpose(0, 2, 1),
                          vq.reshape(B, S, H * hd), vs.transpose(0, 2, 1))
        k = split_heads(k, H)
        v = split_heads(v, H)
        if cross_kv_int4:
            kq, ks = quantize_kv4(k)
            vq, vs = quantize_kv4(v)
            return None, (kq, ks, vq, vs)
        if cross_kv_int8:
            kq, ks = quantize_kv(k)
            vq, vs = quantize_kv(v)
            return None, (kq, ks, vq, vs)
        return None, (k, v)

    if head_minor and not (cross_kv_int8 and self_kv_int8):
        raise ValueError("head_minor requires an int8 KV cache "
                         "(cross_kv_int8 and self_kv_int8): it is the fused "
                         "s8-kernel layout")
    if head_minor and (cross_kv_int4 or self_kv_int4):
        raise ValueError("head_minor (the fused s8 kernel layout) does not "
                         "support int4 packing")
    dec_lora = lora.get("decoder") if lora else None
    lora_ck = dec_lora is not None and "cross_k" in dec_lora
    lora_cv = dec_lora is not None and "cross_v" in dec_lora
    fused_hm = False
    if head_minor and not lora_ck and jax.default_backend() == "tpu":
        # Fused projection+quantize kernel (ops/kv_init.py): the bf16 K/V
        # never round-trip HBM and the padded head-minor slabs + transposed
        # scales are written directly (the jnp body's pad/transpose cost is
        # what made head-minor prep +70 ms in round 3). Adapted cross_v
        # (the reference's q_proj/v_proj target set reaches it) rides the
        # kernel's LoRA path with bank slices gathered ONCE here — the
        # adapter index is frozen for the whole decode. Banks adapting
        # cross_k (not a reference target) keep the jnp body.
        from sar_tpu.ops.kv_init import fused_kv_init_supported
        r_lora = dec_lora["cross_v"]["a"].shape[-1] if lora_cv else 0
        fused_hm = fused_kv_init_supported(cross_pad_len(S), enc_out.shape[2],
                                           H, r_lora)
    if fused_hm:
        from sar_tpu.ops.kv_init import fused_kv_init
        pad = cross_pad_len(S) - S
        enc_pad = (jnp.pad(enc_out, [(0, 0), (0, pad), (0, 0)]) if pad
                   else enc_out)
        kw = {}
        if lora_cv:
            a = dec_lora["cross_v"]["a"]                  # [L, A, d, r]
            b = dec_lora["cross_v"]["b"]                  # [L, A, r, d]
            if adapter_idx is None:
                va, vb = a[:, :1], b[:, :1]               # one shared adapter
            else:
                va, vb = a[:, adapter_idx], b[:, adapter_idx]  # [L, B, d, r]
            kw = dict(va=va.astype(dtype), vb=vb.astype(dtype),
                      lora_scale=lora_scale)
        ck, cks, cv, cvs = fused_kv_init(
            enc_pad, dec["layers"]["cross_k"]["w"],
            dec["layers"]["cross_v"]["w"], dec["layers"]["cross_v"]["b"],
            n_heads=H, t_valid=S, **kw)
    elif cross_kv_int8 or cross_kv_int4:
        _, (ck, cks, cv, cvs) = jax.lax.scan(body, None, (dec["layers"], dec_lora))
    else:
        _, (ck, cv) = jax.lax.scan(body, None, (dec["layers"], dec_lora))
        cks = cvs = None
    if head_minor and not fused_hm:
        pad = cross_pad_len(S) - S
        if pad:
            ck = jnp.pad(ck, [(0, 0), (0, 0), (0, pad), (0, 0)])
            cv = jnp.pad(cv, [(0, 0), (0, 0), (0, pad), (0, 0)])
            cks = jnp.pad(cks, [(0, 0), (0, 0), (0, 0), (0, pad)])
            cvs = jnp.pad(cvs, [(0, 0), (0, 0), (0, 0), (0, pad)])
    L = ck.shape[0]
    self_quant = self_kv_int8 or self_kv_int4
    self_hd = hd // 2 if self_kv_int4 else hd
    self_dtype = jnp.int8 if self_quant else dtype
    # The self cache stays CLASSIC even under head_minor: a fused head-minor
    # self kernel (ops/attic/decode_self.py) measured per-call-overhead-bound —
    # its slabs are ~6x smaller than the cross slabs, so the pallas grid
    # overhead exceeds the dequant savings (1.54 ms/call vs the jnp path's
    # ~0.17 ms/layer at whisper-small B=128).
    return DecodeCache(
        self_k=jnp.zeros((L, SB, H, max_len, self_hd), self_dtype),
        self_v=jnp.zeros((L, SB, H, max_len, self_hd), self_dtype),
        cross_k=ck, cross_v=cv, cross_k_scale=cks, cross_v_scale=cvs,
        self_k_scale=(jnp.zeros((L, SB, H, max_len), jnp.float32)
                      if self_quant else None),
        self_v_scale=(jnp.zeros((L, SB, H, max_len), jnp.float32)
                      if self_quant else None))


def _attention_int8(q, kq, ks, vq, vs, mask=None):
    """q [B,H,1,hd]; kq/vq [B,H,S,hd] int8; ks/vs [B,H,S] fp32 -> [B,H,1,hd].

    scores_s = ks_s * (q . kq_s); out = sum_s probs_s * vs_s * vq_s — the
    per-row scales factor out of both contractions, so the int8 tensors feed
    the MXU directly (converted on the fly, never materialized dequantized).
    `mask` (broadcastable to [.,.,1,S]) handles the self-cache valid prefix.
    """
    dtype = q.dtype
    scores = jnp.einsum("bhqd,bhsd->bhqs", q, kq.astype(dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * ks[:, :, None, :]
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    pw = (probs * vs[:, :, None, :]).astype(dtype)
    return jnp.einsum("bhqs,bhsd->bhqd", pw, vq.astype(dtype),
                      preferred_element_type=jnp.float32).astype(dtype)


def _attention_int8_mxu(q, kq, ks, vq, vs, mask=None):
    """Full-int8-MXU variant of _attention_int8: the query row and the
    softmax probabilities are ALSO quantized per-row to int8 so both
    contractions run as int8xint8->int32 on the MXU (2x the bf16 MXU rate).

    Opt-in (--attn_scores int8): probs quantization costs up to ~4% relative
    output error on random weights — measured 21% faster per attention op on
    v5e — so it stays gated on the token-agreement harness until real-weight
    WER evidence exists (PARITY.md known-deviations)."""
    qq, qs = quantize_kv(q)                               # int8, [B,H,1]
    scores = jnp.einsum("bhqd,bhsd->bhqs", qq, kq,
                        preferred_element_type=jnp.int32).astype(jnp.float32)
    scores = scores * qs[..., None] * ks[:, :, None, :]
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    pw = probs * vs[:, :, None, :]
    pq, ps = quantize_kv(pw)                              # int8, [B,H,1]
    out = jnp.einsum("bhqs,bhsd->bhqd", pq, vq,
                     preferred_element_type=jnp.int32).astype(jnp.float32)
    return (out * ps[..., None]).astype(q.dtype)


def _attention_int4(q, kp, ks, vp, vs, mask=None):
    """int4 twin of _attention_int8: kq/vq arrive nibble-PACKED
    [B,H,S,hd//2] (quantize_kv4 layout), ks/vs [B,H,S] fp32.

    Each contraction splits into two half-width dots over the unpacked
    nibble planes — no lane interleave, so XLA fuses the unpack shifts into
    the operand stream and HBM traffic stays at the packed 0.5 byte/elem:
      scores = q_lo . k_lo + q_hi . k_hi        (halves of the d axis)
      out    = concat(p . v_lo, p . v_hi)       (halves of the output)
    Same scale-factored math as the int8 path otherwise (per-row scales
    multiply outside the dots)."""
    dtype = q.dtype
    hd2 = kp.shape[-1]
    kl, kh = unpack_kv4(kp)
    scores = (jnp.einsum("bhqd,bhsd->bhqs", q[..., :hd2], kl.astype(dtype),
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bhqd,bhsd->bhqs", q[..., hd2:], kh.astype(dtype),
                           preferred_element_type=jnp.float32))
    scores = scores * ks[:, :, None, :]
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    pw = (probs * vs[:, :, None, :]).astype(dtype)
    vl, vh = unpack_kv4(vp)
    ol = jnp.einsum("bhqs,bhsd->bhqd", pw, vl.astype(dtype),
                    preferred_element_type=jnp.float32)
    oh = jnp.einsum("bhqs,bhsd->bhqd", pw, vh.astype(dtype),
                    preferred_element_type=jnp.float32)
    return jnp.concatenate([ol, oh], axis=-1).astype(dtype)


def _split_sl(x, h):
    """[B, S, H*hd] -> [B, S, H, hd] (free view inside the fusion)."""
    B, S, D = x.shape
    return x.reshape(B, S, h, D // h)


def _scale_mask(scores, ks):
    """Mask head-minor layout padding: padded positions carry key scale 0,
    real scales are strictly positive (quantize_kv floors amax at 1e-8).
    Keying the mask on the scales — not on a static length — stays correct
    for any true encoder length the cache was built from."""
    return jnp.where(ks[:, :, None, :] > 0, scores,
                     jnp.finfo(jnp.float32).min)


def _cross_attention_int8(qh, kq, ks, vq, vs):
    """Head-minor int8 variant: kq/vq [B,S_pad,H*hd] int8, ks/vs [B,H,S_pad].
    Same scale-factored math as _attention_int8 (see its docstring)."""
    dtype = qh.dtype
    H = qh.shape[1]
    kq, vq = _split_sl(kq, H), _split_sl(vq, H)
    scores = jnp.einsum("bhqd,bshd->bhqs", qh, kq.astype(dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * ks[:, :, None, :]
    scores = _scale_mask(scores, ks)
    probs = jax.nn.softmax(scores, axis=-1)
    pw = (probs * vs[:, :, None, :]).astype(dtype)
    return jnp.einsum("bhqs,bshd->bhqd", pw, vq.astype(dtype),
                      preferred_element_type=jnp.float32).astype(dtype)


def _cross_attention_int8_mxu(qh, kq, ks, vq, vs):
    """Head-minor layout twin of _attention_int8_mxu (q and probs quantized,
    both contractions int8xint8->int32)."""
    qq, qs = quantize_kv(qh)
    H = qh.shape[1]
    kq, vq = _split_sl(kq, H), _split_sl(vq, H)
    scores = jnp.einsum("bhqd,bshd->bhqs", qq, kq,
                        preferred_element_type=jnp.int32).astype(jnp.float32)
    scores = scores * qs[..., None] * ks[:, :, None, :]
    scores = _scale_mask(scores, ks)
    probs = jax.nn.softmax(scores, axis=-1)
    pw = probs * vs[:, :, None, :]
    pq, ps = quantize_kv(pw)
    out = jnp.einsum("bhqs,bshd->bhqd", pq, vq,
                     preferred_element_type=jnp.int32).astype(jnp.float32)
    return (out * ps[..., None]).astype(qh.dtype)


def _self_attention_int8_hm(qh, kq, ks, vq, vs, valid):
    """Exact int8 self-attention over the head-minor cache: qh [B,H,Q,hd],
    kq/vq [B,max_len,H*hd] s8, ks/vs [B,H,max_len]; `valid` is the traced
    number of live positions (pos+1)."""
    dtype = qh.dtype
    H = qh.shape[1]
    kq, vq = _split_sl(kq, H), _split_sl(vq, H)
    scores = jnp.einsum("bhqd,bshd->bhqs", qh, kq.astype(dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * ks[:, :, None, :]
    mask = jnp.arange(kq.shape[1])[None, None, None] < valid
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    pw = (probs * vs[:, :, None, :]).astype(dtype)
    return jnp.einsum("bhqs,bshd->bhqd", pw, vq.astype(dtype),
                      preferred_element_type=jnp.float32).astype(dtype)


def _self_attention_beam(qh, sk, sv, sks, svs, anc, pos, beam_width):
    """Reorder-free beam self-attention over a slot-major physical cache.

    The self cache holds one slab per (sample, slot): slot j's row at
    position t was written by the logical beam occupying slot j at step t
    and is NEVER moved — the classic per-step reorder_cache gather (a full
    read + write of the self cache every step, the dominant residual beam
    cost measured in round 3/4) is replaced by `anc` [Bs, K, T] int32: the
    slot that wrote the history row t of CURRENT logical beam k (composed
    per step in sar_tpu.decode.beam for ~B*K*T int32 traffic). Attention
    computes scores for ALL J=K slots and keeps the ancestry-selected
    (j, t) entries; the softmax runs over the joint (j, t) axis — exactly
    one slot is live per position, so it equals the per-position softmax
    bit-for-bit on the selected entries. The slab streams ONCE per sample
    (shared by its K beams, like the cross slabs) and the extra K*J score/
    PV FLOPs are MXU-noise.

    qh [Bs*K, H, 1, hd] beam-major rows; sk/sv [Bs*K, H, T, hd] (int8 when
    sks/svs are given, else compute dtype); sks/svs [Bs*K, H, T] fp32.
    Returns [Bs*K, H, 1, hd].
    """
    BK, H, T, hd = sk.shape
    K = beam_width
    Bs = BK // K
    dtype = qh.dtype
    q = qh[:, :, 0].reshape(Bs, K, H, hd)
    k = sk.reshape(Bs, K, H, T, hd)
    v = sv.reshape(Bs, K, H, T, hd)
    scores = jnp.einsum("bkhd,bjhtd->bhkjt", q, k.astype(dtype),
                        preferred_element_type=jnp.float32)
    if sks is not None:
        scores = scores * sks.reshape(Bs, K, H, T).transpose(0, 2, 1, 3)[:, :, None]
    live = (anc[:, None, :, None, :]
            == jnp.arange(K, dtype=anc.dtype)[None, None, None, :, None])
    live = live & (jnp.arange(T)[None, None, None, None, :] <= pos)
    scores = jnp.where(live, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores.reshape(Bs, H, K, K * T),
                           axis=-1).reshape(Bs, H, K, K, T)
    if svs is not None:
        probs = probs * svs.reshape(Bs, K, H, T).transpose(0, 2, 1, 3)[:, :, None]
    out = jnp.einsum("bhkjt,bjhtd->bkhd", probs.astype(dtype), v.astype(dtype),
                     preferred_element_type=jnp.float32).astype(dtype)
    return out.reshape(BK, H, 1, hd)


def _self_attention_int8_mxu_hm(qh, kq, ks, vq, vs, valid):
    """Head-minor self twin of the fused s8 kernel's math (q and probs
    quantized, both contractions int8xint8->int32; CPU/test path)."""
    qq, qs = quantize_kv(qh)
    H = qh.shape[1]
    kq, vq = _split_sl(kq, H), _split_sl(vq, H)
    scores = jnp.einsum("bhqd,bshd->bhqs", qq, kq,
                        preferred_element_type=jnp.int32).astype(jnp.float32)
    scores = scores * qs[..., None] * ks[:, :, None, :]
    mask = jnp.arange(kq.shape[1])[None, None, None] < valid
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    pw = probs * vs[:, :, None, :]
    pq, ps = quantize_kv(pw)
    out = jnp.einsum("bhqs,bshd->bhqd", pq, vq,
                     preferred_element_type=jnp.int32).astype(jnp.float32)
    return (out * ps[..., None]).astype(qh.dtype)


def decode_step(params: Params, tokens: jnp.ndarray, pos: jnp.ndarray,
                cache: DecodeCache, cfg: WhisperConfig, *,
                lora: Params | None = None,
                adapter_idx: jnp.ndarray | None = None,
                lora_scale: float = 1.0,
                scores_int8: bool = False,
                beam_width: int = 1,
                ancestry: jnp.ndarray | None = None) -> tuple[jnp.ndarray, DecodeCache]:
    """One autoregressive step. tokens: [B] int32 at position `pos` (scalar).

    Returns (logits [B, V] fp32, updated cache). Shapes are static; safe
    inside lax.while_loop. The self cache may be allocated SHORTER than the
    final sequence (segmented decode loops carry a growing prefix buffer);
    callers guarantee pos < self_k.shape[3].

    `beam_width` K > 1 means rows are beam-major groups of K per sample
    (row b*K+k = sample b, beam k) and the cache's cross K/V hold ONE copy
    per sample: the K beam queries are folded into the attention's query
    dimension, so cross-KV — the dominant decode traffic (S=1500) — is
    read once per sample instead of once per beam.

    `ancestry` [B/K, K, max_len] int32 (beam mode only) switches the self
    cache to SLOT-MAJOR semantics: rows are never physically reordered by
    the caller; instead anc[b, k, t] names the slot whose row t belongs to
    logical beam k's history (see _self_attention_beam). Column `pos` must
    be the identity (each beam writes its own slot this step). Not
    composable with int4 self-KV or scores_int8 (those paths keep the
    physical reorder).
    """
    dec = params["decoder"]
    B = tokens.shape[0]
    H = cfg.decoder_heads
    hd_full = cfg.d_model // H
    self_int8 = cache.self_k_scale is not None
    # int4 caches are told apart by their nibble-packed hd//2 value axis.
    self_int4 = self_int8 and cache.self_k.shape[-1] == hd_full // 2
    cross_int4 = (cache.cross_k_scale is not None and cache.cross_k.ndim == 5
                  and cache.cross_k.shape[-1] == hd_full // 2)
    dtype = (params["decoder"]["token_embed"].dtype if self_int8
             else cache.self_k.dtype)
    max_len = cache.self_k.shape[3]
    if scores_int8 and (not self_int8 or cache.cross_k_scale is None):
        raise ValueError("scores_int8 requires an int8 KV cache "
                         "(cross_kv_int8=True and self_kv_int8=True)")
    if scores_int8 and (self_int4 or cross_int4):
        raise ValueError("scores_int8 (the s8-MXU path) does not compose "
                         "with int4-packed KV")
    if ancestry is not None and (beam_width <= 1 or self_int4 or scores_int8):
        raise ValueError("ancestry (reorder-free beam self-attention) needs "
                         "beam_width > 1 and does not compose with int4 "
                         "self-KV or scores_int8")
    attn_int8 = _attention_int8_mxu if scores_int8 else _attention_int8

    x = dec["token_embed"][tokens][:, None, :].astype(dtype)      # [B, 1, d]
    x = x + jax.lax.dynamic_slice_in_dim(dec["pos_embed"], pos, 1, 0).astype(dtype)

    pos_mask = (jnp.arange(max_len) <= pos)[None, None, None, :]  # [1,1,1,max]
    scaling = (cfg.d_model // H) ** -0.5
    ctx = LoraCtx(adapter_idx, lora_scale)
    dec_lora = lora.get("decoder") if lora else None

    # Layers are python-unrolled (static layer indices): XLA software-
    # pipelines weight/KV prefetch across layers, and dynamic_update_slice on
    # the carried cache writes only the (pos) column in place. Measured on
    # v5e (whisper-small, B=64): 8.0 ms/step unrolled vs 12.7 ms/step with a
    # fori_loop, vs 20+ ms/step with a scan that re-stacked the whole cache.
    sk_all, sv_all = cache.self_k, cache.self_v
    sks_all, svs_all = cache.self_k_scale, cache.self_v_scale
    L = sk_all.shape[0]
    for l in range(L):
        p = jax.tree.map(lambda a: a[l], dec["layers"])
        lo = (jax.tree.map(lambda a: a[l], dec_lora)
              if dec_lora is not None else {})
        # Self-attention against the cache.
        h = layer_norm(x, p["self_ln"]["scale"], p["self_ln"]["bias"])
        q = _proj(h, p["self_q"], lo.get("self_q"), ctx, 0) * scaling
        kf = _proj(h, p["self_k"], lo.get("self_k"), ctx, 1)  # [B, 1, D]
        vf = _proj(h, p["self_v"], lo.get("self_v"), ctx, 2)
        if self_int8:
            k, v = split_heads(kf, H), split_heads(vf, H)
            quant = quantize_kv4 if self_int4 else quantize_kv
            kq, ks = quant(k)
            vq, vs = quant(v)
            sk_all = jax.lax.dynamic_update_slice(sk_all, kq[None], (l, 0, 0, pos, 0))
            sv_all = jax.lax.dynamic_update_slice(sv_all, vq[None], (l, 0, 0, pos, 0))
            sks_all = jax.lax.dynamic_update_slice(sks_all, ks[None], (l, 0, 0, pos))
            svs_all = jax.lax.dynamic_update_slice(svs_all, vs[None], (l, 0, 0, pos))
            if ancestry is not None:
                a = _self_attention_beam(split_heads(q, H), sk_all[l],
                                         sv_all[l], sks_all[l], svs_all[l],
                                         ancestry, pos, beam_width)
            else:
                self_fn = _attention_int4 if self_int4 else attn_int8
                a = self_fn(split_heads(q, H), sk_all[l], sks_all[l],
                            sv_all[l], svs_all[l], mask=pos_mask)
            a_self = merge_heads(a)
        else:
            k, v = split_heads(kf, H), split_heads(vf, H)
            sk_all = jax.lax.dynamic_update_slice(sk_all, k[None], (l, 0, 0, pos, 0))
            sv_all = jax.lax.dynamic_update_slice(sv_all, v[None], (l, 0, 0, pos, 0))
            if ancestry is not None:
                a = _self_attention_beam(split_heads(q, H), sk_all[l],
                                         sv_all[l], None, None,
                                         ancestry, pos, beam_width)
            else:
                a = attention(split_heads(q, H), sk_all[l], sv_all[l], pos_mask)
            a_self = merge_heads(a)
        x = x + _proj(a_self, p["self_o"], lo.get("self_o"), ctx, 3)
        # Cross-attention against precomputed head-minor K/V ([B,S_pad,H,hd];
        # int8 path when quantized).
        h = layer_norm(x, p["cross_ln"]["scale"], p["cross_ln"]["bias"])
        q = _proj(h, p["cross_q"], lo.get("cross_q"), ctx, 4) * scaling
        qh = split_heads(q, H)                          # [B, H, 1, hd]
        if beam_width > 1:
            # Fold the K beams of each sample into the query dimension so the
            # shared (per-sample) cross K/V slab is streamed once, not K times.
            hd = qh.shape[-1]
            qh = (qh[:, :, 0].reshape(B // beam_width, beam_width, H, hd)
                  .transpose(0, 2, 1, 3))               # [B/K, H, K, hd]
        head_minor = cache.cross_k.ndim == 4
        on_tpu = jax.default_backend() == "tpu"
        if head_minor and on_tpu and not scores_int8:
            # Exact-compute fused streaming kernel (the DEFAULT TPU decode
            # path): the int8 slab is streamed once per (layer, sample) and
            # dequantized in VMEM — same quantization points as the classic
            # _attention_int8 einsum path (int8 K/V, scales factored out,
            # fp32 softmax; q/probs never quantized), but without XLA's
            # dequant-on-the-critical-path. Beam queries fold into extra
            # block-diagonal rows like the s8 kernel.
            from sar_tpu.ops.decode_cross import cross_decode_attention_exact
            if beam_width > 1:
                K = beam_width
                Bs = B // K
                Dm = H * qh.shape[-1]
                o = cross_decode_attention_exact(
                    qh.transpose(0, 2, 1, 3).reshape(Bs, K, Dm),
                    cache.cross_k, cache.cross_k_scale,
                    cache.cross_v, cache.cross_v_scale,
                    layer=l, n_heads=H, out_dtype=dtype, beam_width=K)
                a_merged = o.reshape(B, 1, Dm)          # [B, 1, d_model]
            else:
                o = cross_decode_attention_exact(
                    qh[:, :, 0].reshape(B, -1),
                    cache.cross_k, cache.cross_k_scale,
                    cache.cross_v, cache.cross_v_scale,
                    layer=l, n_heads=H, out_dtype=dtype)
                a_merged = o[:, None, :]                # [B, 1, d_model]
        elif (head_minor and scores_int8
                and jax.default_backend() == "tpu"):
            # Fused s8-MXU kernel: both contractions stay int8 on the MXU
            # and the slabs are never dequantized (ops/decode_cross.py). The
            # FULL stacked cache is the operand; `layer` is a static
            # BlockSpec offset (slicing here would copy the slab per step).
            # Beams ride as K extra query rows of the same two MXU dots
            # ([K*H, D] block-diagonal), streaming each sample's slab once.
            from sar_tpu.ops.decode_cross import cross_decode_attention
            qq, qs = quantize_kv(qh)
            if beam_width > 1:
                K = beam_width
                Bs = B // K
                Dm = H * qh.shape[-1]
                o = cross_decode_attention(
                    qq.transpose(0, 2, 1, 3).reshape(Bs, K, Dm),
                    qs.transpose(0, 2, 1).reshape(Bs, K * H, 1),
                    cache.cross_k, cache.cross_k_scale,
                    cache.cross_v, cache.cross_v_scale,
                    layer=l, n_heads=H, out_dtype=dtype, beam_width=K)
                a_merged = o.reshape(B, 1, Dm)          # [B, 1, d_model]
            else:
                o = cross_decode_attention(
                    qq[:, :, 0].reshape(B, -1), qs,
                    cache.cross_k, cache.cross_k_scale,
                    cache.cross_v, cache.cross_v_scale,
                    layer=l, n_heads=H, out_dtype=dtype)
                a_merged = o[:, None, :]                # [B, 1, d_model]
        else:
            if head_minor:
                # jnp twin of the kernel's math (CPU/tests; XLA pays a
                # per-step slab transpose on this layout — small shapes only)
                cross_fn = (_cross_attention_int8_mxu if scores_int8
                            else _cross_attention_int8)
                a = cross_fn(qh, cache.cross_k[l], cache.cross_k_scale[l],
                             cache.cross_v[l], cache.cross_v_scale[l])
            elif cross_int4:
                a = _attention_int4(qh, cache.cross_k[l],
                                    cache.cross_k_scale[l],
                                    cache.cross_v[l], cache.cross_v_scale[l])
            elif cache.cross_k_scale is not None:
                a = attn_int8(qh, cache.cross_k[l], cache.cross_k_scale[l],
                              cache.cross_v[l], cache.cross_v_scale[l])
            else:
                a = attention(qh, cache.cross_k[l], cache.cross_v[l])
            if beam_width > 1:
                a = (a.transpose(0, 2, 1, 3)            # [B/K, K, H, hd]
                     .reshape(B, H, hd)[:, :, None, :])  # [B, H, 1, hd]
            a_merged = merge_heads(a)
        x = x + _proj(a_merged, p["cross_o"], lo.get("cross_o"), ctx, 7)
        # MLP.
        h = layer_norm(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"])
        h = jax.nn.gelu(linear(h, p["fc1"]), approximate=False)
        x = x + linear(h, p["fc2"])
    x = layer_norm(x, dec["ln"]["scale"], dec["ln"]["bias"])
    logits = jnp.dot(x[:, 0], dec["token_embed"].T.astype(dtype),
                     preferred_element_type=jnp.float32)
    return logits, cache._replace(self_k=sk_all, self_v=sv_all,
                                  self_k_scale=sks_all, self_v_scale=svs_all)
