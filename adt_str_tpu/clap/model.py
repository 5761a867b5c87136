"""CLAP wrapper: audio/text feature extraction + semantic matching.

API parity with the reference `ClapWrapper` (`modules/clap_encoder.py:8-90`):
`get_audio_features`, `get_text_features`, `semantic_match` — reimplemented as
batched JAX inference over the TPU-native towers, with weights loaded from a
local HF `laion/clap-htsat-fused` checkpoint directory (safetensors or
pytorch_model.bin; this environment has no network egress, so the model dir
must be local).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from adt_str_tpu.clap.audio_model import (
    ClapAudioArch,
    audio_params_from_torch_state_dict,
    get_audio_features,
)
from adt_str_tpu.clap.features import MAX_SAMPLES, ClapFeatureExtractor, _device_mel
from adt_str_tpu.clap.text_model import (
    ClapTextArch,
    get_text_features,
    text_params_from_torch_state_dict,
)


def load_clap_state_dict(model_dir: str | Path) -> dict[str, np.ndarray]:
    """Load a HF CLAP checkpoint directory into a numpy state dict."""
    model_dir = Path(model_dir)
    st = model_dir / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        return load_file(str(st))
    bin_path = model_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        sd = torch.load(str(bin_path), map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model.safetensors / pytorch_model.bin in {model_dir}")


def archs_from_hf_config(model_dir: str | Path) -> tuple[ClapAudioArch, ClapTextArch]:
    """Derive the tower architectures from the checkpoint directory's HF
    `config.json` (a transformers `ClapConfig` dump). Lets the curation CLI
    load ANY local CLAP checkpoint — full `laion/clap-htsat-fused` or a
    small distilled one — without hardcoding htsat-fused shapes."""
    import json

    cfg = json.loads((Path(model_dir) / "config.json").read_text())
    a, t = cfg["audio_config"], cfg["text_config"]
    stride = a.get("patch_stride", [4, 4])
    audio = ClapAudioArch(
        window_size=a.get("window_size", 8),
        num_mel_bins=a.get("num_mel_bins", 64),
        spec_size=a.get("spec_size", 256),
        patch_size=a.get("patch_size", 4),
        patch_stride=stride[0] if isinstance(stride, (list, tuple)) else stride,
        hidden_size=a.get("hidden_size", 768),
        projection_dim=cfg.get("projection_dim", a.get("projection_dim", 512)),
        depths=tuple(a.get("depths", (2, 2, 6, 2))),
        num_heads=tuple(a.get("num_attention_heads", (4, 8, 16, 32))),
        patch_embeds_hidden_size=a.get("patch_embeds_hidden_size", 96),
        enable_fusion=a.get("enable_fusion", True),
        mlp_ratio=a.get("mlp_ratio", 4.0),
        aff_block_r=a.get("aff_block_r", 4),
        layer_norm_eps=a.get("layer_norm_eps", 1e-5),
    )
    text = ClapTextArch(
        vocab_size=t.get("vocab_size", 50265),
        hidden_size=t.get("hidden_size", 768),
        num_layers=t.get("num_hidden_layers", 12),
        num_heads=t.get("num_attention_heads", 12),
        intermediate_size=t.get("intermediate_size", 3072),
        max_positions=t.get("max_position_embeddings", 514),
        pad_token_id=t.get("pad_token_id", 1),
        layer_norm_eps=t.get("layer_norm_eps", 1e-12),
        projection_dim=cfg.get("projection_dim", t.get("projection_dim", 512)),
    )
    return audio, text


class ClapWrapper:
    """JAX CLAP encoder (reference `modules/clap_encoder.py` equivalent)."""

    @classmethod
    def from_dir(cls, model_dir: str | Path, sample_rate: int = 48_000,
                 **kwargs) -> "ClapWrapper":
        """Load from a local HF checkpoint directory, deriving tower archs
        from its `config.json` when present (falls back to htsat-fused
        defaults otherwise). The curation CLI's entry point."""
        if (Path(model_dir) / "config.json").exists():
            audio_arch, text_arch = archs_from_hf_config(model_dir)
            kwargs.setdefault("audio_arch", audio_arch)
            kwargs.setdefault("text_arch", text_arch)
        return cls(str(model_dir), sample_rate=sample_rate, **kwargs)

    def __init__(
        self,
        model_name_or_dir: str,
        sample_rate: int = 48_000,
        audio_arch: ClapAudioArch = ClapAudioArch(),
        text_arch: ClapTextArch = ClapTextArch(),
        rng: Optional[np.random.Generator] = None,
        state_dict: Optional[dict[str, np.ndarray]] = None,
    ):
        """`state_dict` bypasses the checkpoint directory load — used by
        benchmarks/tests that run the real towers with synthetic weights."""
        sd = state_dict if state_dict is not None else load_clap_state_dict(model_name_or_dir)
        self.audio_params = audio_params_from_torch_state_dict(sd, audio_arch)
        self.text_params = text_params_from_torch_state_dict(sd, text_arch)
        self.logit_scale_a = float(np.exp(np.asarray(sd["logit_scale_a"])))
        self.audio_arch = audio_arch
        self.text_arch = text_arch
        self.sample_rate = sample_rate
        import jax

        # device dB-mel path (Pallas on TPU) for short clips: the curation
        # throughput path; long clips fall back to the host extractor
        self.feature_extractor = ClapFeatureExtractor(
            rng=rng, use_device=jax.default_backend() != "cpu"
        )
        self._tokenizer = None
        self._model_dir = model_name_or_dir
        self._mesh_audio_params = None  # (mesh, replicated audio params) cache

    # ------------------------------------------------------------------ audio

    def _mesh_place(self, mesh, batch: "jnp.ndarray"):
        """-> (data-axis-sharded batch, replicated audio params) for `mesh`.

        The batch dim is padded to a multiple of the data-axis size so GSPMD
        splits it evenly; params are device_put replicated ONCE per mesh (a
        committed single-device params tree next to a sharded batch would
        otherwise re-transfer every call). Returns the pad row count too."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        pad = (-batch.shape[0]) % n_data
        if pad:
            batch = jnp.concatenate([batch, jnp.zeros((pad,) + batch.shape[1:], batch.dtype)])
        batch = jax.device_put(
            batch, NamedSharding(mesh, P("data", *([None] * (batch.ndim - 1))))
        )
        # structural equality, not identity: curation builds a fresh (equal)
        # local mesh per stage, and an identity key would re-upload the whole
        # tower (hundreds of MB for real CLAP) at every stage
        if self._mesh_audio_params is None or self._mesh_audio_params[0] != mesh:
            replicated = NamedSharding(mesh, P())
            self._mesh_audio_params = (
                mesh,
                jax.device_put(self.audio_params, replicated),
            )
        return batch, self._mesh_audio_params[1], pad

    def get_audio_features(self, audios: list[np.ndarray], mesh=None) -> np.ndarray:
        """list of mono 48 kHz waveforms -> (B, 512) L2-normalized embeddings.

        Short clips on an accelerator take the DEVICE-RESIDENT path: one wave
        upload, then mel -> 4x view replication -> HTSAT tower with every
        intermediate staying in HBM. Routing through the host extractor
        instead would D2H the mel (~16 MB/batch) and re-upload the replicated
        features (~65 MB/batch) — round-3 curation-bench finding; numerics
        are identical (same _pad_short, same device mel, longer=False).

        With `mesh`, the batch dim is sharded over the mesh's `data` axis and
        the tower params are replicated: GSPMD partitions the (per-sample-
        independent) mel + HTSAT programs along batch, so encode throughput
        scales with the data-axis device count — the pod-scale path for
        1M-library curation (the reference encodes on ONE device in a python
        loop, augment_data_with_CLAP.py:124-137)."""
        import jax

        fx = self.feature_extractor
        arrays = [np.asarray(a).reshape(-1) for a in audios]
        use_device_mel = (
            fx.use_device
            and not fx.replicate_hf_longer_quirk
            and all(len(a) <= MAX_SAMPLES for a in arrays)
        )
        params = self.audio_params
        if use_device_mel:
            padded = np.stack([fx._pad_short(a) for a in arrays]).astype(np.float32)
            waves = jnp.asarray(padded)
            pad = 0
            if mesh is not None:
                waves, params, pad = self._mesh_place(mesh, waves)
            mel = _device_mel(waves)  # (B, 1001, 64), on device, batch-sharded
            mels = jnp.repeat(mel[:, None, :, :], 4, axis=1)
            longer = jnp.zeros((mel.shape[0],), bool)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                longer = jax.device_put(longer, NamedSharding(mesh, P("data")))
            out = get_audio_features(params, mels, longer, self.audio_arch)
            out = np.asarray(out)
            return out[: len(arrays)] if pad else out
        feats, is_longer = fx(arrays)
        feats, is_longer = jnp.asarray(feats), jnp.asarray(is_longer)
        pad = 0
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            feats, params, pad = self._mesh_place(mesh, feats)
            if pad:
                is_longer = jnp.concatenate(
                    [is_longer, jnp.zeros((pad,), is_longer.dtype)]
                )
            is_longer = jax.device_put(is_longer, NamedSharding(mesh, P("data")))
        out = np.asarray(get_audio_features(params, feats, is_longer, self.audio_arch))
        return out[: len(arrays)] if pad else out

    # ------------------------------------------------------------------- text

    def tokenize(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """RoBERTa tokenization via the local checkpoint's tokenizer files."""
        if self._tokenizer is None:
            from transformers import AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(self._model_dir)
        enc = self._tokenizer(texts, padding=True, truncation=True, return_tensors="np")
        return enc["input_ids"], enc["attention_mask"]

    def get_text_features(self, texts: list[str]) -> np.ndarray:
        input_ids, attention_mask = self.tokenize(texts)
        out = get_text_features(
            self.text_params,
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask, dtype=jnp.float32),
            self.text_arch,
        )
        return np.asarray(out)

    # ------------------------------------------------------------------ match

    def semantic_match(
        self, audio_features: np.ndarray, text_features: np.ndarray
    ) -> np.ndarray:
        """softmax(logit_scale_a * audio @ text^T) (clap_encoder.py:86-90)."""
        logits = self.logit_scale_a * (audio_features @ text_features.T)
        logits = logits - logits.max(axis=-1, keepdims=True)
        e = np.exp(logits)
        return e / e.sum(axis=-1, keepdims=True)
