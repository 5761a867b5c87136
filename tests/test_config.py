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
