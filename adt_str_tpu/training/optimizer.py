"""Optimizer + LR schedule.

Parity with the reference training arguments (`train.py:192-249`):

- AdamW (torch defaults: b1=0.9, b2=0.999, eps=1e-8), weight decay with the HF
  Trainer exclusion rule (no decay on biases or LayerNorm parameters);
- linear warmup over `warmup_ratio * total_steps`;
- `cosine`: cosine decay to 0 (HF default);
- `cosine_warmup_with_min_lr`: cosine decay from base LR to `min_learning_rate`
  where the *last training step* lands exactly on the floor (the reference's
  custom scheduler, selected when `min_learning_rate > 0`, train.py:202-216);
- global-norm gradient clipping (`max_grad_norm`);
- gradient accumulation via `optax.MultiSteps` (train.py:239).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from adt_str_tpu.config import TrainingConfig


def warmup_cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_ratio: float = 0.1,
    min_lr: Optional[float] = None,
) -> optax.Schedule:
    # HF TrainingArguments.get_warmup_steps rounds UP (math.ceil) — int()
    # truncation here was a one-step schedule divergence vs the reference
    warmup_steps = math.ceil(total_steps * warmup_ratio)
    floor = float(min_lr) if (min_lr is not None and min_lr > 0) else 0.0
    if floor > 0.0:
        # reference custom `cosine_warmup_with_min_lr` (train.py:202-216):
        # the LAST training step (0-based total_steps-1) lands exactly on the
        # min-LR floor, unlike HF's cosine_with_min_lr
        denom = max(total_steps - 1 - warmup_steps, 1)
    else:
        # HF `get_cosine_schedule_with_warmup` exactly: progress hits 1.0 at
        # step == total_steps
        denom = max(total_steps - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip((step - warmup_steps) / denom, 0.0, 1.0)
        cosine = floor + (base_lr - floor) * 0.5 * (1.0 + jnp.cos(math.pi * progress))
        return jnp.where(step < warmup_steps, warm, cosine)

    return schedule


def make_schedule(config: TrainingConfig, total_steps: int) -> optax.Schedule:
    """Resolve `lr_scheduler_type` with the reference's semantics
    (train.py:202-216 + HF TrainingArguments types): `cosine` (upgraded to
    the min-LR-floor variant when `min_learning_rate > 0`), `linear`
    (decay to 0 at total_steps), `constant_with_warmup`, `constant`."""
    t = (config.lr_scheduler_type or "cosine").lower()
    base_lr = float(config.learning_rate)
    # HF get_warmup_steps semantics: math.ceil, not truncation
    warmup_steps = math.ceil(total_steps * config.warmup_ratio)
    if t in ("cosine", "cosine_warmup_with_min_lr", "cosine_with_min_lr"):
        return warmup_cosine_schedule(
            base_lr=base_lr,
            total_steps=total_steps,
            warmup_ratio=config.warmup_ratio,
            min_lr=config.min_learning_rate,
        )
    if t == "linear":
        def linear(step):
            step = jnp.asarray(step, jnp.float32)
            warm = base_lr * step / jnp.maximum(warmup_steps, 1)
            denom = jnp.maximum(total_steps - warmup_steps, 1)
            decay = base_lr * jnp.clip(
                (total_steps - step) / denom, 0.0, 1.0
            )
            return jnp.where(step < warmup_steps, warm, decay)

        return linear
    if t in ("constant", "constant_with_warmup"):
        w = warmup_steps if t == "constant_with_warmup" else 0

        def const(step):
            step = jnp.asarray(step, jnp.float32)
            warm = base_lr * step / jnp.maximum(w, 1)
            return jnp.where(step < w, warm, base_lr)

        return const
    raise ValueError(f"unsupported lr_scheduler_type: {config.lr_scheduler_type}")


def decay_mask(params: Any) -> Any:
    """HF Trainer rule: decay everything except biases and LayerNorm params.

    In this params tree LayerNorm leaves are named scale/bias and biases are
    named `b`; everything else (w, embedding) decays.
    """

    def mask_fn(path, leaf):
        names = {getattr(k, "key", None) for k in path}
        return not ({"b", "bias", "scale"} & names)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(
    config: TrainingConfig, total_steps: int, params: Any
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """`total_steps` is in TRAINER micro-steps (one per batch). The LR
    schedule is built in *optimizer updates* like HF's (the scheduler steps
    once per accumulation window, Trainer.global_step): under MultiSteps the
    inner AdamW count advances once per window, so a micro-step schedule
    would stretch warmup k-fold and finish only 1/k of the decay. The
    returned schedule takes micro-steps (what the trainer logs with) and
    maps them to the applied update-space LR."""
    if config.optim not in ("adamw", "adamw_torch", "adamw_hf", "adamw_torch_fused"):
        # fail fast instead of silently training with AdamW anyway
        raise ValueError(f"unsupported optim: {config.optim!r} (AdamW variants only)")
    accum = max(1, int(config.gradient_accumulation_steps))
    schedule = make_schedule(config, max(1, total_steps // accum))
    tx = optax.chain(
        optax.clip_by_global_norm(float(config.max_grad_norm)),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=float(config.weight_decay),
            mask=decay_mask(params),
        ),
    )
    if accum > 1:
        tx = optax.MultiSteps(tx, accum)
        sched = lambda step: schedule(jnp.asarray(step) // accum)  # noqa: E731
    else:
        sched = schedule
    if int(config.skip_nonfinite_updates) > 0:
        # outermost, so mid-accumulation micro-updates (zeros) stay finite
        # and only real window updates are judged; a skipped step leaves
        # params AND inner optimizer state untouched
        # (tests/test_train_step.py::test_skip_nonfinite_updates)
        tx = optax.apply_if_finite(
            tx, max_consecutive_errors=int(config.skip_nonfinite_updates)
        )
    return tx, sched
