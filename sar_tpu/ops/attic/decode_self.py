"""Fused s8-MXU self-attention decode kernel (Pallas, TPU).

The decode-step twin of ops/decode_cross.py for the growing self-KV cache:
same head-minor [max_len, D] slab layout, same block-diagonal query and
transposed-score formulation (see that module's docstring), with two
differences:
- the valid length is DYNAMIC (pos+1): it arrives as a scalar-prefetch
  operand and masks the score lanes, so one compiled kernel serves every
  decode position;
- the slab per sample is small (max_len <= 448 rows vs the 1500-frame cross
  slab), so each grid cell processes a BLOCK of `nb` batch rows (a python
  loop in-kernel) — per-cell DMA stays large enough to hide the grid
  sequencing overhead that a one-sample cell would expose.

STATUS: a measured-and-parked EXPERIMENT, not wired into decode_step. At
whisper-small B=128 (max_len 264) it ran at 1.54 ms/call vs the jnp int8
path's ~0.17 ms/layer: the self slabs are ~6x smaller than the cross slabs
(264 vs 1536 rows), so the per-grid-cell overhead that the cross kernel
amortizes dominates here. Kept with interpret-mode parity tests
(tests/test_decode_self.py) as the starting point if max_target_positions
ever grows. The production self-attention path stays in whisper.decode_step
(classic layout, XLA fusion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _cell(qq, qs, kq, ks, vq, vs, n, n_heads, head_dim):
    """One sample: qq [1,D] s8, qs [H,1] f32, kq/vq [S,D] s8,
    ks/vs [H,S] f32, n traced valid length -> [1,D] f32."""
    H, hd = n_heads, head_dim
    D = H * hd
    S = kq.shape[0]

    col_head = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // hd
    row = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    qrows = jnp.where(col_head == row,
                      jnp.broadcast_to(qq.astype(jnp.float32), (H, D)),
                      0.0).astype(jnp.int8)

    st = jax.lax.dot_general(qrows, kq, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    st = st.astype(jnp.float32) * qs * ks
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, S), 1)
    st = jnp.where(lane < n, st, NEG)

    m = jnp.max(st, axis=1, keepdims=True)
    p = jnp.exp(st - m)
    pw = (p / jnp.sum(p, axis=1, keepdims=True)) * vs
    ps = jnp.maximum(jnp.max(jnp.abs(pw), axis=1, keepdims=True), 1e-8) / 127.0
    pq = jnp.clip(jnp.round(pw / ps), -127, 127).astype(jnp.int8)
    o = jax.lax.dot_general(pq, vq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * ps
    o = jnp.where(col_head == row, o, 0.0)
    return jnp.sum(o, axis=0, keepdims=True)


def _kernel(n_ref, qq_ref, qs_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref,
            *, n_heads: int, head_dim: int, nb: int):
    n = n_ref[0]
    for bi in range(nb):
        o_ref[bi] = _cell(qq_ref[bi], qs_ref[bi], kq_ref[0, bi],
                          ks_ref[0, bi], vq_ref[0, bi], vs_ref[0, bi],
                          n, n_heads, head_dim).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("layer", "n_heads", "out_dtype",
                                    "interpret"))
def self_decode_attention(qq: jnp.ndarray, qs: jnp.ndarray,
                          kq: jnp.ndarray, ks: jnp.ndarray,
                          vq: jnp.ndarray, vs: jnp.ndarray,
                          valid_len: jnp.ndarray,
                          *, layer: int, n_heads: int,
                          out_dtype=jnp.bfloat16,
                          interpret: bool = False) -> jnp.ndarray:
    """One decode step of self-attention over the head-minor cache.

    qq [B, D] s8 + qs [B, H, 1] f32 (pre-quantized per head, pre-scaled q);
    kq/vq [L, B, max_len, D] s8 and ks/vs [L, B, H, max_len] f32 are the
    FULL stacked cache (static `layer` BlockSpec offset — no slab copies);
    valid_len: traced int32 scalar (pos+1). Returns [B, D].
    """
    B, D = qq.shape
    H = n_heads
    hd = D // H
    S = kq.shape[2]
    l = layer
    nb = next(n for n in (8, 4, 2, 1) if B % n == 0)

    kernel = functools.partial(_kernel, n_heads=H, head_dim=hd, nb=nb)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // nb,),
            in_specs=[
                pl.BlockSpec((nb, 1, D), lambda b, n: (b, 0, 0)),
                pl.BlockSpec((nb, H, 1), lambda b, n: (b, 0, 0)),
                pl.BlockSpec((1, nb, S, D), lambda b, n: (l, b, 0, 0)),
                pl.BlockSpec((1, nb, H, S), lambda b, n: (l, b, 0, 0)),
                pl.BlockSpec((1, nb, S, D), lambda b, n: (l, b, 0, 0)),
                pl.BlockSpec((1, nb, H, S), lambda b, n: (l, b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((nb, 1, D), lambda b, n: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(valid_len, jnp.int32).reshape(1), qq[:, None, :], qs,
      kq, ks, vq, vs)
    return out[:, 0]


def self_decode_reference(qq, qs, kq, ks, vq, vs, valid_len, *, layer,
                          n_heads, out_dtype=jnp.bfloat16):
    """jnp reference with identical quantization points (parity tests)."""
    kq, ks, vq, vs = kq[layer], ks[layer], vq[layer], vs[layer]
    B, D = qq.shape
    H = n_heads
    hd = D // H
    S = kq.shape[1]
    qf = qq.reshape(B, H, hd).astype(jnp.float32) * qs
    kf = kq.reshape(B, S, H, hd).astype(jnp.float32)
    st = jnp.einsum("bhd,bshd->bhs", qf, kf) * ks
    st = jnp.where(jnp.arange(S)[None, None] < valid_len, st, NEG)
    p = jax.nn.softmax(st, axis=-1)
    pw = p * vs
    pscale = jnp.maximum(jnp.max(jnp.abs(pw), -1, keepdims=True), 1e-8) / 127.0
    pqq = jnp.clip(jnp.round(pw / pscale), -127, 127)
    vf = vq.reshape(B, S, H, hd).astype(jnp.float32)
    o = jnp.einsum("bhs,bshd->bhd", pqq, vf) * pscale
    return o.reshape(B, D).astype(out_dtype)
