import os

from adt_str_tpu.config import (
    FrameworkConfig,
    deep_merge_dicts,
    load_merged_config,
    substitute_env_vars,
)


def test_deep_merge():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    over = {"a": {"y": 20, "z": 30}, "c": 4}
    merged = deep_merge_dicts(base, over)
    assert merged == {"a": {"x": 1, "y": 20, "z": 30}, "b": 3, "c": 4}
    assert base["a"]["y"] == 2  # no mutation


def test_env_substitution():
    os.environ["ADT_TEST_VAR"] = "hello"
    assert substitute_env_vars("path: ${oc.env:ADT_TEST_VAR}/x") == "path: hello/x"
    assert substitute_env_vars("path: ${ADT_TEST_VAR}") == "path: hello"
    assert substitute_env_vars("path: ${UNSET_VAR_XYZ}") == "path: ${UNSET_VAR_XYZ}"


def test_framework_config_splat(tmp_path):
    yaml_text = """
shared:
  sample_rate: 24000
  input_sec: 2.56
training:
  learning_rate: 8.0e-4
tokenizer:
  ADTOF_mapping: true
synthetiser:
  oneshot_path: /tmp/oneshot
  similarity_threshold: 0.8
TrainDatasetConfig:
  dataset_path: /tmp/lakh
  dataset_name: Lakh
"""
    p = tmp_path / "exp.yaml"
    p.write_text(yaml_text)
    cfg = FrameworkConfig.from_yaml(p)
    # shared splatted into model/synth/dataset sections
    assert cfg.model.sample_rate == 24000
    assert cfg.synthetiser.sample_rate == 24000
    assert cfg.train_data.sample_rate == 24000
    # tokenizer ADTOF copied into synth
    assert cfg.synthetiser.ADTOF_mapping is True
    # training lr duplicated into model enc/dec lr
    assert cfg.model.enc_lr == 8.0e-4
    # defaults from configs/config_default.yaml merged in
    assert cfg.model.d_model == 768
    assert cfg.model.ffn_dim == 3072


def test_shared_derived_quantities():
    cfg = FrameworkConfig.from_dict({})
    assert cfg.shared.hop_length == 240
    assert cfg.shared.chunk_samples == 61440


def test_reference_train_yamls_load_unchanged():
    """Config-compat contract: every train YAML shipped by the reference repo
    (incl. the tau-sweep ablation configs, reference configs/train/*.yaml)
    loads through FrameworkConfig.from_yaml with no edits, and the tau knob
    lands in synthetiser.similarity_threshold."""
    import glob

    ref_yamls = sorted(glob.glob("/root/reference/configs/train/*.yaml"))
    if not ref_yamls:
        import pytest

        pytest.skip("reference repo not present")
    assert len(ref_yamls) == 5, ref_yamls
    for path in ref_yamls:
        cfg = FrameworkConfig.from_yaml(
            path, default_path="/root/reference/configs/config_default.yaml"
        )
        assert cfg.model.d_model == 768
        assert cfg.shared.sample_rate == 24000
        if "tau" in path:
            tau = float(path.rsplit("-", 1)[1].removesuffix(".yaml"))
            assert cfg.synthetiser.similarity_threshold == tau
            assert cfg.training.min_learning_rate == 5e-5
            assert cfg.training.learning_rate == 8e-4


def test_reference_eval_and_preprocess_yamls_load_unchanged():
    """The reference's eval + preprocess YAMLs also load with no edits
    (reference configs/eval/*.yaml, configs/preprocess/*.yaml)."""
    import glob

    ref_yamls = sorted(glob.glob("/root/reference/configs/eval/*.yaml")) + sorted(
        glob.glob("/root/reference/configs/preprocess/*.yaml")
    )
    if not ref_yamls:
        import pytest

        pytest.skip("reference repo not present")
    assert len(ref_yamls) == 7, ref_yamls
    for path in ref_yamls:
        FrameworkConfig.from_yaml(
            path, default_path="/root/reference/configs/config_default.yaml"
        )


def test_repo_tau_sweep_configs():
    """The repo ships its own tau-sweep configs mirroring the reference's."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "configs" / "train"
    for tau in (0.4, 0.6, 0.8):
        cfg = FrameworkConfig.from_yaml(root / f"setting-tau-{tau}.yaml")
        assert cfg.synthetiser.similarity_threshold == tau
        assert cfg.training.min_learning_rate == 5e-5
        assert cfg.model.d_model == 768
    # and the default model yaml parses as a bare model section
    from adt_str_tpu.config import ModelConfig, load_config_from_yaml, make_dataclass_from

    model_d = load_config_from_yaml(root.parent / "default" / "model.yaml")
    mc = make_dataclass_from(ModelConfig, model_d)
    assert mc.d_model == 64 * 6 and mc.dec_layers == 3
