"""Optimizer & LR schedules (optax).

Parity with the reference's training-loop optimization semantics
(/root/reference/src/training/trainer.py):
- AdamW with weight decay masked off biases/LayerNorms (trainer.py:106-132)
- schedulers linear/cosine/constant, each = linear warmup from ~0
  (start factor 1e-8) into the decay stage (trainer.py:134-197)
- global-norm gradient clipping at 1.0 (trainer.py:260-267)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def make_schedule(kind: str, learning_rate: float, warmup_steps: int,
                  max_steps: int) -> optax.Schedule:
    # Cancellation-free warmup: optax.linear_schedule computes
    # (init - end)*(1 - frac) + end, which in float32 rounds the tiny
    # init (lr * 1e-8, the reference's warmup start factor) to exactly 0 at
    # step 0; `init*(1-frac) + end*frac` keeps it exact at both endpoints.
    init = learning_rate * 1e-8
    steps = max(warmup_steps, 1)

    def warmup(count):
        frac = jnp.clip(count / steps, 0.0, 1.0)
        return init * (1.0 - frac) + learning_rate * frac
    decay_steps = max(max_steps - warmup_steps, 1)
    if kind == "linear":
        decay = optax.linear_schedule(learning_rate, 0.0, decay_steps)
    elif kind == "cosine":
        decay = optax.cosine_decay_schedule(learning_rate, decay_steps)
    elif kind == "constant":
        decay = optax.constant_schedule(learning_rate)
    else:
        raise ValueError(f"Unknown scheduler {kind!r} (linear|cosine|constant)")
    return optax.join_schedules([warmup, decay], [warmup_steps])


def decay_mask(params) -> dict:
    """True (apply weight decay) only for rank>=2 weight matrices — the
    functional equivalent of the reference's no-decay-on-bias/LayerNorm
    param groups (trainer.py:106-132)."""
    return jax.tree.map(lambda x: jnp.ndim(x) >= 2, params)


def make_optimizer(learning_rate: float = 5e-4, weight_decay: float = 0.01,
                   warmup_steps: int = 500, max_steps: int = 5000,
                   scheduler: str = "linear", max_grad_norm: float = 1.0,
                   ) -> tuple[optax.GradientTransformation, optax.Schedule]:
    schedule = make_schedule(scheduler, learning_rate, warmup_steps, max_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay, mask=decay_mask),
    )
    return tx, schedule
