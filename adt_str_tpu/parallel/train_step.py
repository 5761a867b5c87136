"""Jitted data/tensor-parallel training and eval steps.

Replaces the reference's HF-Trainer inner loop (`train.py:40-78` compute_loss +
accelerate DDP). One XLA program per step: forward (bf16) -> fp32 loss ->
backward -> global-norm clip -> AdamW update. Under a (data, model) mesh the
gradient reduction is a `psum` over ICI inserted by the compiler from the
sharding layout; there is no hand-written collective code, matching the
reference's "no repo-level collectives" design at the TPU-native level
(SURVEY.md §2.4).

Notable deviations from the reference, by design:
- no per-step `gc.collect()`/`empty_cache()` (reference anti-pattern,
  train.py:74-76);
- causal/padding masks are built inside the jitted step (the reference builds
  the padding mask on host each step, train.py:61).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from adt_str_tpu.config import ModelConfig
from adt_str_tpu.models import adt

Params = dict[str, Any]


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params: Params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(config: ModelConfig, tx: optax.GradientTransformation):
    """Returns jitted `step(state, batch, rng) -> (state, metrics)`.

    `batch`: {"wavs": (B, samples) f32, "tokens": (B, T) i32,
    "token_lengths": (B,) i32}. Token lengths follow the reference collate
    convention (apply `adt.collate_token_lengths` host- or device-side first).
    """

    def loss_fn(params, batch, rng):
        return adt.forward_loss(
            params,
            batch["wavs"],
            batch["tokens"],
            batch["token_lengths"],
            config,
            rng=rng,
            train=True,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Params, rng: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def make_synth_train_step(
    config: ModelConfig,
    synth_config,
    statics,
    tx: optax.GradientTransformation,
):
    """Training step with on-device synthesis fused in: one XLA program does
    one-shot gathers + scatter-add rendering + FX + mel + transformer fwd/bwd +
    AdamW. Replaces the reference's CPU dataloader-worker synthesis
    (train_dataset.py:228 + synthetiser.py:255-292) — the audio never exists
    on the host.

    `batch`: {"notes": (B, MAX_NOTES, 4), "note_mask": (B, MAX_NOTES),
    "tokens": (B, T), "token_lengths": (B,)}.
    """
    from adt_str_tpu.synth.render import check_bins_loaded, render_batch

    # eager: inside the jitted step loaded_bins is a tracer and cannot raise
    check_bins_loaded(statics, synth_config.similarity_threshold)

    def loss_fn(params, batch, wavs, rng):
        return adt.forward_loss(
            params,
            wavs,
            batch["tokens"],
            batch["token_lengths"],
            config,
            rng=rng,
            train=True,
        )

    # `statics` must be a jit *argument*, not a closure: closed-over arrays are
    # embedded in the lowered module as literal constants, and a production
    # one-shot bank is GBs — the serialized HLO then breaks compilation
    # (observed: axon remote_compile broken pipe at a 1.8 GB bank). As an
    # argument it is passed by reference to the device-resident buffers.
    @partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, batch: Params, rng: jax.Array, statics):
        k_synth, k_model = jax.random.split(rng)
        synth_keys = jax.random.split(k_synth, batch["notes"].shape[0])
        wavs = render_batch(
            statics, batch["notes"], batch["note_mask"], synth_keys, synth_config
        )
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, wavs, k_model)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1), metrics

    def step(state: TrainState, batch: Params, rng: jax.Array):
        return _step(state, batch, rng, statics)

    return step


def make_synth_eval_step(config: ModelConfig, synth_config, statics):
    """Teacher-forced eval loss for note-list (Lakh) datasets: the validation
    audio is rendered on device exactly like the training path, but under a
    caller-fixed rng so the eval stream is identical across eval calls and
    losses are comparable over training. (The reference cannot evaluate on
    Lakh at all — its evaluate() consumes pre-rendered wavs, train.py:94-99.)
    """
    from adt_str_tpu.synth.render import check_bins_loaded, render_batch

    check_bins_loaded(statics, synth_config.similarity_threshold)

    # statics as a jit argument, not a closure — see make_synth_train_step
    @jax.jit
    def _step(params: Params, batch: Params, rng: jax.Array, statics):
        keys = jax.random.split(rng, batch["notes"].shape[0])
        wavs = render_batch(
            statics, batch["notes"], batch["note_mask"], keys, synth_config
        )
        return adt.forward_loss(
            params,
            wavs,
            batch["tokens"],
            batch["token_lengths"],
            config,
            rng=None,
            train=False,
        )

    def step(params: Params, batch: Params, rng: jax.Array):
        return _step(params, batch, rng, statics)

    return step


def make_eval_step(config: ModelConfig):
    """Jitted teacher-forced eval loss (reference ADTTrainer.evaluate,
    train.py:80-141)."""

    @jax.jit
    def step(params: Params, batch: Params):
        return adt.forward_loss(
            params,
            batch["wavs"],
            batch["tokens"],
            batch["token_lengths"],
            config,
            rng=None,
            train=False,
        )

    return step
