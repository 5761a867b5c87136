"""Training loop — the HF-Trainer replacement (`ADTTrainer` + `train()`,
train.py:33-329), TPU-native.

Responsibilities and their reference counterparts:
- builds tokenizer / synthesizer bank / dataset / model from the merged config
  (train.py:270-301);
- AdamW + linear-warmup cosine(-min-LR) schedule + grad clip + accumulation
  (train.py:219-249 via TrainingArguments);
- bf16 compute with fp32 loss (mixed_precision bf16, train.py:233-234);
- Lakh path: *on-device* synthesis fused into the jitted train step
  (`make_synth_train_step`) — the reference's CPU dataloader-worker synthesis
  is the documented bottleneck (SURVEY.md §3.1);
- TMIDT path: real audio batches from the host pipeline;
- per-step logging (logging_steps, train.py:227), optional wandb
  (experiment.use_wandb, train.py:260-267; gated — wandb is absent in this
  image), save-every-n-steps + max_checkpoints GC + auto-resume
  (train.py:179-190, 228-232), final save (train.py:323);
- optional `jax.profiler` trace window (`logging.profile_steps`) — the
  reference has no profiling at all (SURVEY.md §5.1).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import numpy as np

import jax

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.data.datasets import LakhDataset, TMIDTDataset
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.models import adt
from adt_str_tpu.parallel import mesh as mesh_lib
from adt_str_tpu.parallel.train_step import (
    TrainState,
    init_train_state,
    make_synth_train_step,
    make_train_step,
)
from adt_str_tpu.synth.bank import load_bank_hdf5
from adt_str_tpu.synth.render import SynthStatics
from adt_str_tpu.training import checkpoint as ckpt_lib
from adt_str_tpu.training.optimizer import make_optimizer

logger = logging.getLogger(__name__)


# canonical home is utils.misc (preprocessing CLIs must not import the
# training stack just for logging setup); re-exported here for callers
from adt_str_tpu.utils.misc import setup_logging  # noqa: E402,F401


def _maybe_wandb(cfg: FrameworkConfig):
    if not cfg.experiment.use_wandb:
        return None
    if jax.process_index() != 0:  # one wandb run per job, not per host
        return None
    try:
        import wandb

        wandb.init(
            project=cfg.experiment.project_name,
            config=cfg.raw,
            name=cfg.experiment.run_name,
        )
        return wandb
    except ImportError:
        logger.warning("use_wandb=true but wandb is not installed; logging locally only")
        return None


def evaluate_loss(
    params,
    model_cfg,
    dataset,
    batch_size: int,
    rng=None,
    synth_config=None,
    statics=None,
    max_batches: int | None = None,
    eval_step=None,
    mesh=None,
) -> float:
    """Teacher-forced validation loss over a dataset (parity with
    `ADTTrainer.evaluate`, train.py:80-141: same tgt_input/labels/padding-mask
    contract as training, mean over batches).

    Two dataset flavors:
    - real-audio batches ("wavs" present, e.g. TMIDT) — evaluated directly;
    - note-list batches (Lakh) — pass `synth_config` + `statics` and the audio
      is rendered on device under a fixed per-batch-index key, so repeated
      eval calls see the identical audio stream and losses are comparable.

    `eval_step` lets a caller reuse one jitted step across periodic in-training
    evals (rebuilding it every call would recompile).

    With `mesh`, the eval runs sharded like training: each process loads its
    stride of the fixed unshuffled prefix (`batch_size` rows per host),
    batches assemble into global arrays, and every host sees the identical
    replicated loss. The batch count is computed analytically so all hosts
    take the same number of collective steps (a host running one extra batch
    would deadlock the others).
    """
    from adt_str_tpu.parallel import mesh as mesh_lib
    from adt_str_tpu.parallel.train_step import make_eval_step, make_synth_eval_step

    rng = rng or np.random.default_rng(0)
    synth = synth_config is not None and statics is not None
    if eval_step is None:
        eval_step = (
            make_synth_eval_step(model_cfg, synth_config, statics, mesh=mesh)
            if synth
            else make_eval_step(model_cfg, mesh=mesh)
        )
    process_count = jax.process_count()
    process_index = jax.process_index()
    n_batches = len(dataset) // batch_size
    if process_count > 1:
        # every host must run the same number of sharded steps
        n_batches = (len(dataset) // process_count) // batch_size
    if max_batches is not None:
        n_batches = min(n_batches, max_batches)

    def place(batch: dict) -> dict:
        if mesh is not None:
            return mesh_lib.shard_batch(mesh, batch)
        return {k: jax.numpy.asarray(v) for k, v in batch.items()}

    eval_key = jax.random.PRNGKey(0)
    total, batches = 0.0, 0
    for batch in dataset.batches(
        batch_size, rng, shuffle=False,
        process_index=process_index, process_count=process_count,
    ):
        if batches >= n_batches:
            break
        if "wavs" in batch:
            device_batch = place(
                {k: batch[k] for k in ("wavs", "tokens", "token_lengths")}
            )
            total += float(eval_step(params, device_batch))
        elif "notes" in batch and synth:
            device_batch = place(
                {k: batch[k] for k in ("notes", "note_mask", "tokens", "token_lengths")}
            )
            total += float(
                eval_step(params, device_batch, jax.random.fold_in(eval_key, batches))
            )
        else:
            raise ValueError(
                "evaluate_loss needs real-audio batches (wavs) or a note-list "
                "dataset with synth_config+statics for on-device rendering"
            )
        batches += 1
    return total / batches if batches else 0.0


def train(cfg: FrameworkConfig) -> TrainState:
    setup_logging(cfg.logging.log_level)
    mesh_lib.maybe_initialize_distributed()
    assert cfg.train_data is not None, "TrainDatasetConfig section is required"
    wandb = _maybe_wandb(cfg)

    tokenizer = MidiTokenizer(cfg.tokenizer)
    data_cfg = cfg.train_data

    synth_statics = None
    if data_cfg.dataset_name == "Lakh":
        from adt_str_tpu.synth.bank import n_allowed_bins

        assert cfg.synthetiser is not None, "Synthetiser is required for Lakh dataset"
        bank_path = f"{cfg.synthetiser.oneshot_path}@{cfg.synthetiser.sample_rate}.hdf5"
        max_len = int(cfg.synthetiser.max_oneshot_sec * cfg.synthetiser.sample_rate)
        # bin-capped load: rows in similarity bins the threshold never allows
        # are skipped at read time (exact — see load_bank_hdf5). This is the
        # bank capacity story for large curated libraries (from_bank guards
        # the device budget explicitly).
        bank = load_bank_hdf5(
            bank_path, max_len,
            n_allowed_bins=n_allowed_bins(cfg.synthetiser.similarity_threshold),
        )
        synth_statics = SynthStatics.from_bank(bank)
        dataset = LakhDataset(data_cfg, tokenizer, max_notes=cfg.synthetiser.max_notes)
        logger.info(
            "Lakh dataset: %d segments, bank: %d one-shots in %d eligible "
            "bins (%.2f GiB on device)",
            len(dataset), bank.n_samples, bank.loaded_bins,
            synth_statics.waveforms.size * synth_statics.waveforms.dtype.itemsize / 2**30,
        )
    elif data_cfg.dataset_name == "TMIDT":
        dataset = TMIDTDataset(data_cfg, tokenizer)
        logger.info("TMIDT dataset: %d items", len(dataset))
    else:
        raise ValueError(f"Dataset name {data_cfg.dataset_name} not supported")

    model_cfg = cfg.model
    params = adt.init_params(jax.random.PRNGKey(cfg.experiment.seed), model_cfg)
    logger.info("model params: %.2f M", adt.param_count(params) / 1e6)

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    process_count = jax.process_count()
    process_index = jax.process_index()
    # mesh layout from config (MeshConfig): model_axis > 1 enables the
    # Megatron-style TP shardings in parallel/mesh.py
    n_model = max(1, cfg.mesh.model_axis)
    assert n_global % n_model == 0, (n_global, n_model)
    n_data = cfg.mesh.data_axis if cfg.mesh.data_axis > 0 else n_global // n_model
    # rows this process loads per step: batch_size per data-parallel replica;
    # the global batch is process_count x this (each host strides the epoch
    # by process_index, _epoch_batches)
    global_batch = cfg.training.batch_size * max(1, n_local // n_model)
    # holdout_fraction reserves the dataset prefix for in-training eval;
    # those rows never enter shuffled training epochs (datasets._epoch_batches)
    holdout_rows = int(len(dataset) * data_cfg.holdout_fraction)
    if (
        data_cfg.holdout_fraction > 0
        and cfg.logging.eval_every_n_steps
        and holdout_rows < global_batch * process_count
    ):
        # a partial (or int-truncated-to-zero) holdout would be silently
        # topped up with trained rows by the unshuffled-prefix eval stream —
        # fail fast instead. Without in-training eval the reserved rows are
        # merely excluded from training (e.g. for offline eval), which stays
        # valid at any size.
        raise ValueError(
            f"holdout_fraction={data_cfg.holdout_fraction} reserves only "
            f"{holdout_rows} of {len(dataset)} rows but one eval batch needs "
            f"{global_batch * process_count}; raise holdout_fraction or "
            "shrink the batch"
        )
    n_train_rows = len(dataset) - holdout_rows
    steps_per_epoch = max(1, n_train_rows // (global_batch * process_count))
    total_steps = int(steps_per_epoch * float(cfg.training.num_epochs))
    if cfg.training.max_steps:
        total_steps = min(total_steps, cfg.training.max_steps)
    logger.info(
        "devices=%d local (%d global, %d processes) per-host batch=%d "
        "steps/epoch=%d total_steps=%d",
        n_local, n_global, process_count, global_batch, steps_per_epoch,
        total_steps,
    )

    tx, schedule = make_optimizer(cfg.training, total_steps, params)

    mesh = None
    if n_global > 1:
        # the mesh spans ALL global devices; params are identical on every
        # host (same seed), so the global device_put in shard_params is valid
        mesh = mesh_lib.make_mesh(n_data=n_data, n_model=n_model)
        params = mesh_lib.shard_params(mesh, params, fsdp=cfg.mesh.fsdp)

    if data_cfg.dataset_name == "Lakh":
        step_fn = make_synth_train_step(
            model_cfg, cfg.synthetiser, synth_statics, tx, mesh=mesh,
            comm_dtype=cfg.training.grad_allreduce_dtype,
            ddp_loss_weighting=cfg.training.ddp_loss_weighting,
        )
    else:
        step_fn = make_train_step(
            model_cfg, tx, mesh=mesh,
            comm_dtype=cfg.training.grad_allreduce_dtype,
            ddp_loss_weighting=cfg.training.ddp_loss_weighting,
        )
    state = init_train_state(params, tx)

    # resume
    output_dir = Path(cfg.logging.output_dir) / cfg.experiment.run_name
    output_dir.mkdir(parents=True, exist_ok=True)
    start_step = 0
    resume = cfg.checkpoint.resume_from_checkpoint
    if not resume and cfg.checkpoint.auto_resume:
        resume = ckpt_lib.latest_checkpoint(output_dir)
    if resume:
        p, o, start_step, _ = ckpt_lib.restore_checkpoint(
            resume, {"params": state.params, "opt_state": state.opt_state}
        )
        if mesh is not None:
            p = mesh_lib.shard_params(mesh, p, fsdp=cfg.mesh.fsdp)
        state = TrainState(p, o, state.step + start_step)
        logger.info("resumed from %s at step %d", resume, start_step)

    step_key = jax.random.PRNGKey(cfg.experiment.seed + 1)
    profile_steps = cfg.logging.profile_steps or []

    # in-training evaluation (reference eval_strategy/eval_every_n, wired):
    # the monitored set is a fixed unshuffled prefix of the dataset — the
    # reference ships no validation split (train.py:313 passes
    # eval_dataset=None); Lakh eval audio is rendered on device under fixed
    # keys so the eval stream is constant across calls.
    eval_every = cfg.logging.eval_every_n_steps
    eval_step_fn = None
    if eval_every:
        from adt_str_tpu.parallel.train_step import make_eval_step, make_synth_eval_step

        if data_cfg.dataset_name == "Lakh":
            eval_step_fn = make_synth_eval_step(
                model_cfg, cfg.synthetiser, synth_statics, mesh=mesh
            )
        else:
            eval_step_fn = make_eval_step(model_cfg, mesh=mesh)

    def _run_eval(step_idx: int) -> None:
        import json

        # with a holdout, the eval stream must stay inside the held-out
        # prefix (its rows are excluded from training epochs)
        eval_cap = cfg.logging.eval_batches
        if holdout_rows:
            prefix_batches = max(
                1, holdout_rows // (global_batch * process_count)
            )
            eval_cap = min(eval_cap or prefix_batches, prefix_batches)
        e_loss = evaluate_loss(
            state.params,
            model_cfg,
            dataset,
            batch_size=global_batch,
            synth_config=cfg.synthetiser if data_cfg.dataset_name == "Lakh" else None,
            statics=synth_statics,
            max_batches=eval_cap,
            eval_step=eval_step_fn,
            mesh=mesh,
        )
        logger.info("eval @ step %d: eval_loss=%.4f", step_idx, e_loss)
        if wandb:
            wandb.log({"eval_loss": e_loss}, step=step_idx)
        if process_index == 0:  # single writer; the loss is replicated anyway
            with open(output_dir / "eval_history.jsonl", "a") as f:
                f.write(json.dumps({"step": step_idx, "eval_loss": e_loss}) + "\n")

    from adt_str_tpu.data.datasets import prefetch_batches

    # Preemption-safe shutdown (the reference has no preemption handling,
    # SURVEY.md §5.3): SIGTERM/SIGINT set a host-local flag; the loop
    # finishes the in-flight step, saves a checkpoint, and exits cleanly.
    #
    # Multi-host coordination: a signal lands on ONE host at an arbitrary
    # step boundary, and a host that breaks out alone deadlocks the others'
    # collectives (and the orbax save barrier). So each step every host
    # contributes its local flag to a tiny replicated global-max; the result
    # is fetched one step LATE (the deferred-logging trick) so the collective
    # never blocks dispatch. All hosts therefore observe the same value at
    # the same step index and enter one final orbax save together.
    import signal

    stop_requested = {"flag": False}
    prev_handlers = {}

    def _on_signal(signum, frame):  # pragma: no cover - exercised via e2e test
        stop_requested["flag"] = True
        logger.info("signal %d received: will checkpoint and stop", signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:  # non-main thread (tests)
            pass

    stop_check = None  # multi-host: () -> replicated jax scalar (global OR)
    if process_count > 1 and mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data_axis = mesh.shape[mesh_lib.DATA_AXIS]
        if n_data_axis % process_count == 0:
            flag_sharding = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
            _global_or = jax.jit(
                lambda x: x.max(), out_shardings=NamedSharding(mesh, P())
            )
            local_rows = n_data_axis // process_count

            def stop_check():
                local = np.full(
                    (local_rows,), int(stop_requested["flag"]), dtype=np.int32
                )
                return _global_or(
                    jax.make_array_from_process_local_data(flag_sharding, local)
                )

        else:  # data axis not process-aligned: fall back to save cadence
            logger.warning(
                "data axis (%d) not divisible by process count (%d): "
                "preemption signals fall back to the periodic save cadence",
                n_data_axis, process_count,
            )

    step_idx = start_step
    t_last = time.perf_counter()
    # Deferred step logging: fetching the just-dispatched step's loss every
    # step (reference logging_steps=1) puts a host<->device round trip on the
    # critical path and serializes dispatch. Instead the metrics of a logging
    # step are fetched at the *next* logging step — by then they are already
    # complete, so the fetch is free, the host stays at most one logging
    # interval ahead (bounded run-ahead: the fetch throttles the dispatch
    # queue), and the device pipelines H2D/step/D2H. Logged values are
    # bit-identical, just written one interval later.
    pending_log = None  # (step_idx, metrics) awaiting fetch
    last_logged_idx = start_step

    def _flush_step_log() -> None:
        nonlocal pending_log, last_logged_idx, t_last
        if pending_log is None:
            return
        idx, m = pending_log
        pending_log = None
        loss = float(m["loss"])  # blocks only until step `idx` completes
        now = time.perf_counter()
        sps = (idx - last_logged_idx) / max(now - t_last, 1e-9)
        last_logged_idx, t_last = idx, now
        lr = float(schedule(idx))
        # training.skip_nonfinite_updates observability: cumulative skipped
        # (NaN/Inf) update count, present only when the guard is enabled
        skipped = ""
        if "notfinite_total" in m:
            skipped = f" skipped={int(m['notfinite_total'])}"
        logger.info(
            "step %d/%d loss=%.4f grad_norm=%.3f lr=%.2e steps/s=%.2f%s",
            idx, total_steps, loss, float(m["grad_norm"]), lr, sps, skipped,
        )
        if wandb:
            wb = {"loss": loss, "lr": lr, "steps_per_sec": sps}
            if "notfinite_total" in m:
                wb["notfinite_total"] = int(m["notfinite_total"])
            wandb.log(wb, step=idx)

    # deterministic resume: the data order and augmentation stream are keyed
    # by (seed, epoch) and the first `skip` batches of the in-progress epoch
    # are skipped index-only — a resumed run replays the exact remaining
    # stream (the reference relies on HF Trainer's batch skipping)
    epoch = start_step // steps_per_epoch
    skip = start_step % steps_per_epoch
    last_saved_step = -1
    pending_stop = None  # multi-host: last step's dispatched global-OR
    done = False

    def _preemption_save() -> None:
        nonlocal last_saved_step
        if last_saved_step != step_idx:
            path = ckpt_lib.save_checkpoint(
                output_dir, state.params, state.opt_state, step_idx,
                epoch, max_checkpoints=cfg.checkpoint.max_checkpoints,
            )
            last_saved_step = step_idx
            logger.info("preemption checkpoint %s", path)
    while not done:
        epoch_rng = np.random.default_rng([cfg.experiment.seed, epoch])
        batches = prefetch_batches(
            dataset.batches(
                global_batch, epoch_rng, shuffle=True, skip=skip,
                process_index=process_index, process_count=process_count,
            ),
            depth=max(1, data_cfg.prefetch),
        )
        # every host runs exactly the analytic steps_per_epoch batches per
        # epoch: when len(dataset) is not divisible by process_count the
        # per-host striding yields hosts one-off batch counts, and without
        # this truncation hosts' epoch boundaries drift (a global batch would
        # silently mix epochs, and resume's skip arithmetic would be wrong)
        epoch_budget = steps_per_epoch - skip
        skip = 0
        for batch in batches:
            if step_idx >= total_steps or epoch_budget <= 0:
                done = step_idx >= total_steps
                break
            epoch_budget -= 1
            device_batch = dict(batch)
            if data_cfg.dataset_name != "Lakh":
                device_batch.pop("notes", None)
                device_batch.pop("note_mask", None)
            if mesh is not None:
                device_batch = mesh_lib.shard_batch(mesh, device_batch)
            else:
                device_batch = {
                    k: jax.numpy.asarray(v) for k, v in device_batch.items()
                }

            if profile_steps and step_idx == profile_steps[0]:
                jax.profiler.start_trace(str(output_dir / "profile"))
            state, metrics = step_fn(
                state, device_batch, jax.random.fold_in(step_key, step_idx)
            )
            if profile_steps and step_idx == profile_steps[-1]:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()

            step_idx += 1
            if step_idx % cfg.logging.logging_steps == 0:
                _flush_step_log()
                pending_log = (step_idx, metrics)
            if eval_every and step_idx % eval_every == 0:
                _flush_step_log()  # keep wandb step ordering monotonic
                _run_eval(step_idx)
            if (
                cfg.logging.save_every_n_steps
                and step_idx % cfg.logging.save_every_n_steps == 0
            ):
                _flush_step_log()
                # every process enters the save (orbax synchronizes the jax
                # cluster and elects the writer; see checkpoint.py)
                path = ckpt_lib.save_checkpoint(
                    output_dir, state.params, state.opt_state, step_idx, epoch,
                    max_checkpoints=cfg.checkpoint.max_checkpoints,
                )
                last_saved_step = step_idx
                if process_index == 0:
                    logger.info("saved checkpoint %s", path)
            if stop_check is not None:
                # multi-host: act on LAST step's replicated global-OR (the
                # collective completed while this step ran — the fetch is
                # free and every host reads the identical value), then
                # dispatch this step's contribution
                if pending_stop is not None and int(pending_stop):
                    _preemption_save()  # all hosts enter the barrier together
                    done = True
                    break
                pending_stop = stop_check()
            elif stop_requested["flag"] and process_count == 1:
                _preemption_save()
                done = True
                break
        epoch += 1
        if step_idx >= total_steps:
            done = True

    _flush_step_log()
    if last_saved_step != step_idx:
        path = ckpt_lib.save_checkpoint(
            output_dir, state.params, state.opt_state, step_idx, epoch,
            max_checkpoints=cfg.checkpoint.max_checkpoints,
        )
        if process_index == 0:
            logger.info("training complete; final checkpoint %s", path)
    else:
        logger.info("training complete (final step already checkpointed)")
    for sig, handler in prev_handlers.items():
        signal.signal(sig, handler)
    if wandb:
        wandb.finish()
    return state
