"""Config system: YAML load + deep-merge + typed dataclasses.

Reproduces the reference's two-stage OmegaConf merge semantics
(`utils/config_utils.py:4-14`: default yaml deep-merged with the experiment
yaml), the env-var substitution helper (`train.py:331-341`), and the
section-splat idioms (`shared` splatted into dataset/synth/model sections,
`train.py:270-299`) — without an OmegaConf dependency (plain PyYAML).

Typed sections mirror `config.py:8-119` of the reference as frozen (hashable,
jit-static-friendly) dataclasses with defaults so partial configs validate
cleanly.
"""

from __future__ import annotations

import dataclasses
import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import yaml

_ENV_OC = re.compile(r"\$\{oc\.env:([^}]+)\}")
_ENV_PLAIN = re.compile(r"\$\{([^}]+)\}")

# Default config shipped with the framework (mirrors configs/config_default.yaml
# of the reference, with TPU-specific additions under `tpu:`).
DEFAULT_CONFIG_PATH = Path(__file__).resolve().parent.parent / "configs" / "config_default.yaml"


def substitute_env_vars(content: str) -> str:
    """`${oc.env:VAR}` / `${VAR}` -> value of $VAR (left untouched if unset).

    Same behavior as the reference helper (`train.py:331-341`), but actually
    wired into the load path (the reference defines it and never calls it).
    """

    def _replace(match: re.Match) -> str:
        return os.getenv(match.group(1), match.group(0))

    content = _ENV_OC.sub(_replace, content)
    content = _ENV_PLAIN.sub(_replace, content)
    return content


class _Yaml12Loader(yaml.SafeLoader):
    """SafeLoader with a YAML 1.2-style float resolver.

    The reference's YAMLs spell scientific-notation floats without a dot
    (`learning_rate: 8e-4`, `min_learning_rate: 5e-5`,
    `configs/train/setting-tau-0.4.yaml:8-9`). OmegaConf resolves those to
    floats; stock PyYAML follows YAML 1.1 and loads them as *strings*, which
    would poison the optimizer. Register the 1.2 float grammar explicitly.
    """


_Yaml12Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |[-+]?\.[0-9_]+(?:[eE][-+]?[0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def load_config_from_yaml(path: str | Path) -> dict:
    """Load a YAML file into a plain dict (env vars substituted)."""
    with open(path, "r") as f:
        content = f.read()
    data = yaml.load(substitute_env_vars(content), Loader=_Yaml12Loader)
    return data or {}


def deep_merge_dicts(base: dict, override: dict) -> dict:
    """Recursive dict merge, override wins; returns a new dict."""
    merged = dict(base)
    for key, value in (override or {}).items():
        if key in merged and isinstance(merged[key], dict) and isinstance(value, dict):
            merged[key] = deep_merge_dicts(merged[key], value)
        else:
            merged[key] = value
    return merged


def load_merged_config(experiment_path: str | Path, default_path: str | Path | None = None) -> dict:
    """Default-config + experiment-config merge, the standard entry-point flow
    (`train.py:347-352`, `eval.py:535-538`)."""
    default_path = Path(default_path) if default_path else DEFAULT_CONFIG_PATH
    base = load_config_from_yaml(default_path) if default_path.exists() else {}
    exp = load_config_from_yaml(experiment_path)
    return deep_merge_dicts(base, exp)


def _filter_kwargs(cls, kwargs: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kwargs.items() if k in names}


def make_dataclass_from(cls, *sections: dict):
    """Build dataclass `cls` from merged dict sections (later wins), dropping
    unknown keys. Replaces the reference's exact-kwargs construction, which
    crashes on any extra key."""
    merged: dict = {}
    for s in sections:
        merged.update(s or {})
    return cls(**_filter_kwargs(cls, merged))


@dataclass(frozen=True)
class SharedConfig:
    """Audio framing contract shared by every stage (reference `config.py:8-13`)."""

    input_sec: float = 2.56
    time_res: float = 0.01
    win_length: int = 2048
    sample_rate: int = 24000

    @property
    def hop_length(self) -> int:
        return int(self.time_res * self.sample_rate)

    @property
    def chunk_samples(self) -> int:
        return int(self.input_sec * self.sample_rate)


@dataclass(frozen=True)
class TokenizerConfig:
    """Mirrors `MidiTokenizerConfig` (`modules/midi_tokenizer.py:9-16`)."""

    ADTOF_mapping: bool = False
    BOS_token: int = 2
    EOS_token: int = 3
    pad_token: int = 1
    silence_token: int = 0
    add_velocity: bool = True

    def __post_init__(self):
        # The loss's ignore_index (model.py:237) and EOS/PAD decode truncation
        # (eval.py:379-381) hardcode PAD=1 in the reference; the model side
        # here mirrors that (models/adt.py:PAD_TOKEN). Reject configs that
        # would silently diverge from it.
        if self.pad_token != 1:
            raise ValueError(
                "pad_token must be 1: the loss ignore_index and decode "
                "truncation are fixed to the reference vocab layout "
                "(specials silence=0, PAD=1, BOS=2, EOS=3)"
            )


@dataclass(frozen=True)
class ModelConfig(SharedConfig):
    """Mirrors `ADTModelConfig` (`config.py:81-119`)."""

    enc_layers: int = 4
    dec_layers: int = 4
    nhead: int = 6
    d_query: int = 128
    dropout: float = 0.1
    tgt_vocab_size: int = 1400
    enc_lr: float = 1e-4
    dec_lr: float = 1e-4
    plain: bool = True
    n_mels: int = 128
    # TPU additions (no reference equivalent):
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    max_positions: int = 2048  # sinusoidal PE table length (model.py:53)
    use_pallas_mel: bool = False
    use_flash_attention: bool = False  # fused short-seq attention kernel
    use_pallas_ffn: bool = False  # fused FFN+dropout kernel (train hot path)
    # per-layer jax.checkpoint during training: recompute activations in the
    # backward pass instead of storing them, trading ~1 extra forward of
    # FLOPs for O(layers) less activation memory — enables larger batches /
    # models per chip (TPU addition; the reference never enables torch's
    # equivalent gradient_checkpointing knob)
    remat: bool = False

    @property
    def d_model(self) -> int:
        return self.d_query * self.nhead

    @property
    def ffn_dim(self) -> int:
        return int(self.d_model * 4)  # model.py:206,213


@dataclass(frozen=True)
class SynthConfig(SharedConfig):
    """Mirrors `SynthDrumConfig` (`modules/synthetiser.py:15-27`)."""

    oneshot_path: str = ""
    similarity_threshold: float = 0.8
    max_hat_std_velocity: float = 0.15
    max_hat_mean_velocity: float = 0.1
    max_cymbals_std_velocity: float = 0.15
    max_cymbals_mean_velocity: float = 0.65
    ADTOF_mapping: bool = False
    mixup_range: float = 0.8
    use_fx_prob: float = 0.3
    use_reverb_prob: float = 0.5
    use_limiter_prob: float = 0.5
    use_compression_prob: float = 0.5
    # TPU additions: static shapes for the on-device renderer.
    max_notes: int = 128  # notes per 2.56 s segment, padded/masked
    max_oneshot_sec: float = 2.56  # one-shot bank rows padded to this length


@dataclass(frozen=True)
class TrainDataConfig(SharedConfig):
    """Mirrors `TrainDatasetConfig`/`LakhDatasetConfig` (`train_dataset.py:23-38`)."""

    dataset_path: str = ""
    empty_tokens_percentage: float = 0.05
    random_velocity_prob: float = 0.5
    dataset_name: str = "Lakh"
    partitions: Optional[list[str]] = None
    # TPU additions: static shapes + host pipeline knobs.
    max_tokens: int = 512  # static padded token length per example
    shuffle_buffer: int = 8192
    prefetch: int = 2
    seed: int = 0
    # Fraction of the dataset (the unshuffled prefix) excluded from training
    # epochs and reserved for the in-training eval stream, so `eval_loss`
    # measures generalization. Default 0.0 is reference parity: the reference
    # ships no validation split at all (train.py:313 passes
    # eval_dataset=None) and the monitored prefix is also trained on.
    holdout_fraction: float = 0.0


@dataclass(frozen=True)
class EvalDataConfig(SharedConfig):
    """Mirrors `EvalDatasetConfig` + ENST/MDB variants (`eval_dataset.py:21-37`)."""

    dataset_path: str = ""
    dataset_name: str = "ENST"
    drummers: Optional[list[int]] = None
    minus_one: bool = False
    splits: Optional[list[int]] = None
    demucs_separated: bool = False


@dataclass
class TrainingConfig:
    """Mirrors the `training:` yaml section consumed at `train.py:219-249`."""

    batch_size: int = 64
    num_epochs: float = 1.0
    learning_rate: float = 1e-4
    min_learning_rate: Optional[float] = None
    warmup_ratio: float = 0.1
    weight_decay: float = 1e-5
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1
    mixed_precision: str = "bf16"
    optim: str = "adamw"
    lr_scheduler_type: str = "cosine"
    eval_strategy: str = "no"
    max_dataloader_num_workers: int = 0
    max_steps: Optional[int] = None  # explicit cap (TPU addition)
    # Gradient all-reduce transport dtype over the data mesh axis (TPU
    # addition): None/'f32' = exact fp32 pmean (default), 'bf16' = cast for
    # transport only — halves the DP program's one collective; params and
    # the AdamW update stay fp32 (parallel/train_step._allreduce_grads).
    grad_allreduce_dtype: Optional[str] = None
    # Mesh loss weighting (TPU addition): False (default) = exact global
    # token-weighted mean on any mesh layout (mesh-invariant math, matches
    # the reference's single-process trainer); True = accelerate/DDP
    # per-rank weighting (each shard's masked mean weighs equally — the
    # reference's own multi-GPU behavior; differs only at ragged lengths).
    ddp_loss_weighting: bool = False
    # Production-training guard (TPU addition): N > 0 wraps the optimizer in
    # optax.apply_if_finite(N) — a step whose updates contain NaN/Inf is
    # skipped (params and Adam state untouched) instead of poisoning the
    # run; after N CONSECUTIVE non-finite steps the updates pass through
    # again so the failure is visible rather than silently looping. 0 (the
    # default) keeps reference behavior: the only NaN defense is the
    # logits nan_to_num the reference also applies (model.py:233).
    skip_nonfinite_updates: int = 0


@dataclass
class LoggingConfig:
    output_dir: str = "./outputs"
    logging_steps: int = 1
    save_every_n_steps: Optional[int] = None
    eval_every_n_steps: Optional[int] = None
    eval_batches: int = 8  # batches per in-training eval pass (TPU addition)
    log_level: str = "INFO"
    profile_steps: Optional[list[int]] = None  # jax.profiler trace window (TPU addition)


@dataclass
class CheckpointConfig:
    resume_from_checkpoint: Optional[str] = None
    auto_resume: bool = False
    max_checkpoints: Optional[int] = 3


@dataclass
class ExperimentConfig:
    seed: int = 42
    use_wandb: bool = False
    project_name: Optional[str] = None
    run_name: str = "default"


@dataclass
class InferenceConfig:
    checkpoint_path: Optional[str] = None
    batch_size: int = 8
    max_length: int = 1024
    beam_size: int = 5
    use_beam_search: bool = False
    output_path: str = "results/"
    max_samples: Optional[int] = None


@dataclass
class ServingConfig:
    """Online-serving engine knobs (`serve.py` / `serving/engine.py`).

    Framework addition — the reference has no serving layer (its inference
    surface is the per-file CLI, `/root/reference/inference.py`). Defaults
    match the engine's constructor so an absent `serving:` section keeps
    pre-round-5 behavior; CLI flags on `serve.py` override YAML."""

    buckets: tuple = (1, 2, 4, 8, 16, 32, 64)
    max_wait_ms: float = 2.0
    max_length: Optional[int] = None  # None -> inference.max_length
    # decode strategy: greedy (default, the metric path) or beam — the same
    # `models.decode.beam_search_decode` the eval harness uses
    use_beam_search: bool = False
    beam_size: int = 5
    length_penalty: float = 1.0
    host: str = "127.0.0.1"
    port: int = 8321
    precompile: bool = True

    def __post_init__(self) -> None:
        self.buckets = tuple(int(b) for b in self.buckets)


@dataclass
class MeshConfig:
    """TPU parallelism layout (no reference equivalent; reference delegates DP
    to HF accelerate, SURVEY.md §2.4)."""

    data_axis: int = -1  # -1: all remaining devices
    model_axis: int = 1
    # ZeRO-3-style fully-sharded params/optimizer over the data axis: each
    # weight's largest free dim is sharded n_data-ways, XLA inserts the
    # all-gather/reduce-scatter collectives (parallel/mesh.py:fsdp_partition_specs)
    fsdp: bool = False


@dataclass(frozen=True)
class ClapConfig(SharedConfig):
    """Mirrors `ClapConfig` (`config.py:17-22`)."""

    model_name: str = "laion/clap-htsat-fused"
    batch_size: int = 32
    sample_pack_root: str = ""
    reference_root: str = ""


@dataclass
class FrameworkConfig:
    """Top-level typed view over the merged YAML dict."""

    shared: SharedConfig = field(default_factory=SharedConfig)
    tokenizer: TokenizerConfig = field(default_factory=TokenizerConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    synthetiser: Optional[SynthConfig] = None
    train_data: Optional[TrainDataConfig] = None
    eval_data: Optional[EvalDataConfig] = None
    training: TrainingConfig = field(default_factory=TrainingConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)
    serving: ServingConfig = field(default_factory=ServingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    raw: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, cfg: dict) -> "FrameworkConfig":
        """Apply the reference's section-splat idioms (`train.py:270-299`):
        `shared` is splatted into dataset/synth/model sections; the tokenizer's
        `ADTOF_mapping` is copied into the synth config; `training.learning_rate`
        is duplicated into model enc_lr/dec_lr."""
        shared_d = cfg.get("shared", {}) or {}
        tok_d = cfg.get("tokenizer", {}) or {}
        training_d = cfg.get("training", {}) or {}
        model_d = dict(cfg.get("model", {}) or {})
        if training_d.get("learning_rate") is not None:
            lr = float(training_d["learning_rate"])
            model_d.setdefault("enc_lr", lr)
            model_d.setdefault("dec_lr", lr)

        synth = None
        if cfg.get("synthetiser"):
            synth_d = dict(cfg["synthetiser"])
            synth_d["ADTOF_mapping"] = tok_d.get("ADTOF_mapping", False)
            synth = make_dataclass_from(SynthConfig, synth_d, shared_d)

        train_data = None
        if cfg.get("TrainDatasetConfig"):
            train_data = make_dataclass_from(
                TrainDataConfig, cfg["TrainDatasetConfig"], shared_d
            )

        eval_data = None
        if cfg.get("EvalDatasetConfig"):
            eval_data = make_dataclass_from(
                EvalDataConfig, cfg["EvalDatasetConfig"], shared_d
            )

        def _coerce(cls_, section):
            d = {
                k: v
                for k, v in (cfg.get(section, {}) or {}).items()
                if v is not None
            }
            return make_dataclass_from(cls_, d)

        return cls(
            shared=make_dataclass_from(SharedConfig, shared_d),
            tokenizer=make_dataclass_from(TokenizerConfig, tok_d),
            model=make_dataclass_from(ModelConfig, model_d, shared_d),
            synthetiser=synth,
            train_data=train_data,
            eval_data=eval_data,
            training=_coerce(TrainingConfig, "training"),
            logging=_coerce(LoggingConfig, "logging"),
            checkpoint=_coerce(CheckpointConfig, "checkpoint"),
            experiment=_coerce(ExperimentConfig, "experiment"),
            inference=_coerce(InferenceConfig, "inference"),
            serving=_coerce(ServingConfig, "serving"),
            mesh=_coerce(MeshConfig, "mesh"),
            raw=cfg,
        )

    @classmethod
    def from_yaml(cls, experiment_path: str | Path, default_path: str | Path | None = None) -> "FrameworkConfig":
        return cls.from_dict(load_merged_config(experiment_path, default_path))
