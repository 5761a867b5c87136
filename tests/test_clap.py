"""CLAP port parity tests vs HF transformers (torch, random small configs)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from adt_str_tpu.clap import features as feat_lib
from adt_str_tpu.clap.model import ClapWrapper
from adt_str_tpu.clap.audio_model import (
    ClapAudioArch,
    audio_params_from_torch_state_dict,
    get_audio_features,
)
from adt_str_tpu.clap.text_model import (
    ClapTextArch,
    get_text_features,
    text_params_from_torch_state_dict,
)


@pytest.fixture(scope="module")
def torch_clap():
    from transformers.models.clap.configuration_clap import (
        ClapAudioConfig,
        ClapConfig,
        ClapTextConfig,
    )
    from transformers.models.clap.modeling_clap import ClapModel

    audio_cfg = ClapAudioConfig(
        window_size=4,
        num_mel_bins=16,
        spec_size=64,
        patch_size=4,
        patch_stride=[4, 4],
        hidden_size=16,  # num_features = 8 * 2^(n_stages-1)
        projection_dim=32,
        depths=[2, 2],  # resolutions 16, 8 — always >= window
        num_attention_heads=[2, 4],
        enable_fusion=True,
        patch_embeds_hidden_size=8,
        aff_block_r=4,
    )
    text_cfg = ClapTextConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=48,
        projection_dim=32,
    )
    cfg = ClapConfig.from_text_audio_configs(text_cfg, audio_cfg, projection_dim=32)
    torch.manual_seed(0)
    model = ClapModel(cfg).eval()
    return model, audio_cfg, text_cfg


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _arch_from_cfg(cfg):
    return ClapAudioArch(
        window_size=cfg.window_size,
        num_mel_bins=cfg.num_mel_bins,
        spec_size=cfg.spec_size,
        patch_size=cfg.patch_size,
        patch_stride=cfg.patch_stride[0],
        hidden_size=cfg.hidden_size,
        projection_dim=cfg.projection_dim,
        depths=tuple(cfg.depths),
        num_heads=tuple(cfg.num_attention_heads),
        patch_embeds_hidden_size=cfg.patch_embeds_hidden_size,
        enable_fusion=cfg.enable_fusion,
        aff_block_r=cfg.aff_block_r,
    )


def test_audio_tower_parity(torch_clap):
    model, audio_cfg, _ = torch_clap
    arch = _arch_from_cfg(audio_cfg)
    sd = _sd(model)
    params = audio_params_from_torch_state_dict(sd, arch)

    rng = np.random.default_rng(0)
    # spec_width = spec_size * freq_ratio = 256; use shorter T to exercise the
    # bicubic interpolation path; mixed is_longer exercises fusion + plain
    T, F = 251, arch.num_mel_bins
    feats = rng.normal(size=(2, 4, T, F)).astype(np.float32)
    is_longer = np.array([False, True])

    with torch.no_grad():
        ref = model.get_audio_features(
            input_features=torch.from_numpy(feats),
            is_longer=torch.from_numpy(is_longer[:, None]),
        ).numpy()
    ours = np.asarray(
        get_audio_features(params, jnp.asarray(feats), jnp.asarray(is_longer), arch)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_text_tower_parity(torch_clap):
    model, _, text_cfg = torch_clap
    arch = ClapTextArch(
        vocab_size=text_cfg.vocab_size,
        hidden_size=text_cfg.hidden_size,
        num_layers=text_cfg.num_hidden_layers,
        num_heads=text_cfg.num_attention_heads,
        intermediate_size=text_cfg.intermediate_size,
        max_positions=text_cfg.max_position_embeddings,
        projection_dim=text_cfg.projection_dim,
    )
    sd = _sd(model)
    params = text_params_from_torch_state_dict(sd, arch)

    rng = np.random.default_rng(1)
    ids = rng.integers(4, 100, (3, 12)).astype(np.int64)
    ids[:, 0] = 0
    mask = np.ones_like(ids)
    ids[2, 8:] = 1  # pad
    mask[2, 8:] = 0

    with torch.no_grad():
        ref = model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).numpy()
    ours = np.asarray(
        get_text_features(
            params, jnp.asarray(ids), jnp.asarray(mask, dtype=jnp.float32), arch
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_feature_extractor_short_matches_hf():
    from transformers.models.clap.feature_extraction_clap import ClapFeatureExtractor

    hf = ClapFeatureExtractor()
    ours = feat_lib.ClapFeatureExtractor()
    rng = np.random.default_rng(2)
    audio = rng.normal(size=48_000 * 3).astype(np.float64) * 0.3  # 3 s

    ref = hf([audio], sampling_rate=48_000, return_tensors="np")
    ref_feats = np.asarray(ref["input_features"])[0]
    our_feats, is_longer = ours([audio])
    assert not is_longer[0]
    assert our_feats[0].shape == ref_feats.shape
    np.testing.assert_allclose(our_feats[0], ref_feats, atol=2e-3, rtol=1e-4)


def test_feature_extractor_long_shrink_channel():
    ours = feat_lib.ClapFeatureExtractor()
    rng = np.random.default_rng(3)
    audio = rng.normal(size=48_000 * 14).astype(np.float64) * 0.3  # 14 s
    feats, is_longer = ours([audio])
    assert is_longer[0]
    assert feats.shape == (1, 4, 1001, 64)
    # crops are genuine slices of the full mel
    full = feat_lib._log_mel_db(audio, ours.fb)
    crop = feats[0, 1]
    found = False
    for start in range(full.shape[0] - crop.shape[0] + 1):
        if np.allclose(full[start : start + crop.shape[0]], crop, atol=1e-5):
            found = True
            break
    assert found


def test_device_feature_extractor_matches_host():
    """Device (XLA on CPU here; Pallas on TPU) dB log-mel path matches the
    numpy extractor for short audio."""
    rng = np.random.default_rng(5)
    audio = (rng.normal(size=48_000 * 2) * 0.3).astype(np.float64)
    host = feat_lib.ClapFeatureExtractor()
    dev = feat_lib.ClapFeatureExtractor(use_device=True)
    h_feats, h_longer = host([audio])
    d_feats, d_longer = dev([audio])
    assert not h_longer[0] and not d_longer[0]
    assert h_feats.shape == d_feats.shape
    np.testing.assert_allclose(d_feats, h_feats, atol=5e-2)  # dB scale


def test_device_path_matches_host_on_ragged_short_batch():
    """Device dB-mel path on a ragged batch of repeat-padded one-shot-length
    clips (incl. awkward prime lengths) matches the numpy extractor."""
    rng = np.random.default_rng(9)
    host = feat_lib.ClapFeatureExtractor()
    dev = feat_lib.ClapFeatureExtractor(use_device=True)
    clips = [
        (rng.normal(size=13_001) * 0.4).astype(np.float64),
        (rng.normal(size=91_193) * 0.2).astype(np.float64),
        (rng.normal(size=7919) * 0.5).astype(np.float64),
    ]
    h_feats, _ = host(clips)
    d_feats, _ = dev(clips)
    np.testing.assert_allclose(d_feats, h_feats, atol=5e-2)


def test_wrapper_device_resident_short_path(torch_clap, monkeypatch):
    """ClapWrapper.get_audio_features' device-resident short-clip path (one
    wave upload, mel + 4x views on device) must hand the tower exactly the
    features the extractor-then-upload route it shortcuts would (only the
    host round trip differs — round-3 curation-bench finding). The tower
    call itself is identical code in both routes, so it is stubbed here and
    the features it RECEIVES are compared."""
    model, audio_cfg, text_cfg = torch_clap
    audio_arch = _arch_from_cfg(audio_cfg)
    wrapper = ClapWrapper(
        "unused", state_dict=_sd(model), audio_arch=audio_arch,
        text_arch=ClapTextArch(
            vocab_size=text_cfg.vocab_size,
            hidden_size=text_cfg.hidden_size,
            num_layers=text_cfg.num_hidden_layers,
            num_heads=text_cfg.num_attention_heads,
            intermediate_size=text_cfg.intermediate_size,
            max_positions=text_cfg.max_position_embeddings,
            projection_dim=text_cfg.projection_dim,
        ),
    )
    seen = {}

    def tower_stub(params, mels, longer, arch):
        seen["mels"] = np.asarray(mels)
        seen["longer"] = np.asarray(longer)
        return jnp.zeros((mels.shape[0], 8))

    import adt_str_tpu.clap.model as model_lib

    monkeypatch.setattr(model_lib, "get_audio_features", tower_stub)
    rng = np.random.default_rng(11)
    clips = [
        (rng.normal(size=30_000) * 0.3).astype(np.float32),
        (rng.normal(size=7919) * 0.5).astype(np.float32),
    ]

    wrapper.feature_extractor.use_device = True  # forced on (CPU backend here)
    wrapper.get_audio_features(clips)
    fused_mels, fused_longer = seen["mels"], seen["longer"]
    assert fused_mels.shape[1] == 4 and not fused_longer.any()

    # the route being shortcut: host extractor (same device mel) + upload
    host_feats, host_longer = wrapper.feature_extractor(clips)
    np.testing.assert_allclose(fused_mels, host_feats, atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(fused_longer, np.asarray(host_longer))
