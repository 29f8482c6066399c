"""Config system tests: includes, overrides, freezing, reference-schema parse."""

import os

import pytest

from vitxtgqa_tpu.core.config import (
    ConfigNode,
    Configuration,
    build_config,
    decode_value,
    nested_merge,
)


def cfg_path(repo_root, name):
    return os.path.join(repo_root, "configs", name)


def test_nested_merge_deep():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    nested_merge(base, {"a": {"b": 10, "e": 4}})
    assert base == {"a": {"b": 10, "c": 2, "e": 4}, "d": 3}


def test_decode_value():
    assert decode_value("1e-4") == 1e-4
    assert decode_value("True") is True
    assert decode_value("None") is None
    assert decode_value("[10000, 20000]") == [10000, 20000]
    assert decode_value("hello") == "hello"


def test_confignode_attr_access_and_freeze():
    node = ConfigNode({"a": {"b": 5}, "lst": [{"x": 1}]})
    assert node.a.b == 5
    assert node.lst[0].x == 1
    node.freeze()
    with pytest.raises(AttributeError):
        node.a.b = 7
    node.defrost()
    node.a.b = 7
    assert node.a.b == 7


def test_t2s_config_parses_with_includes(repo_root):
    cfg = build_config(cfg_path(repo_root, "t2s_abinet.yml"))
    # from the dataset-defaults include
    assert cfg.dataset_attributes.vtextgqa.processors.context_processor.type == "fasttext"
    # from the experiment file
    assert cfg.model_attributes.t2s.grounding.frame_topk == 5
    assert cfg.model_attributes.t2s.mmt.num_hidden_layers == 3
    assert cfg.training_parameters.batch_size == 48
    assert cfg.training_parameters.max_grad_l2_norm == 0.25
    assert cfg.training_parameters.lr_steps == [10000, 20000]
    # from base defaults
    assert cfg.training_parameters.log_interval == 100
    assert cfg.training_parameters.tpu.compute_dtype == "bfloat16"
    # losses list with weights
    losses = cfg.model_attributes.t2s.losses
    assert losses[0].type == "pos_bce_loss" and losses[1].weight == 1000


def test_dotted_opts_override(repo_root):
    cfg = build_config(
        cfg_path(repo_root, "t2s_abinet.yml"),
        opts=[
            "training_parameters.batch_size", "8",
            "model_attributes.t2s.grounding.frame_topk", "3",
            "training_parameters.data_parallel", "True",
        ],
    )
    assert cfg.training_parameters.batch_size == 8
    assert cfg.model_attributes.t2s.grounding.frame_topk == 3
    assert cfg.training_parameters.data_parallel is True


def test_json_override(repo_root):
    cfg = build_config(
        cfg_path(repo_root, "t2s_abinet.yml"),
        config_override='{"training_parameters": {"max_iterations": 5}}',
    )
    assert cfg.training_parameters.max_iterations == 5


def test_args_update_matches_any_depth(repo_root):
    import argparse

    args = argparse.Namespace(seed=13, batch_size=4, config=None, opts=None)
    c = Configuration(cfg_path(repo_root, "t2s_abinet.yml"))
    c.update_with_args(args)
    cfg = c.freeze()
    assert cfg.training_parameters.seed == 13
    assert cfg.training_parameters.batch_size == 4


def test_reference_config_parses_if_available():
    """The reference repo's own YAML (with its include prefix) must parse."""
    ref = "/root/reference/configs/t2s_abinet.yml"
    if not os.path.exists(ref):
        pytest.skip("reference tree not mounted")
    cfg = build_config(ref)
    assert cfg.model_attributes.t2s.ocr.mmt_in_dim == 1004
    assert cfg.dataset_attributes.vtextgqa.frames == 64


def test_all_reference_configs_parse_if_available():
    """SURVEY §7.2 acceptance: every reference experiment config parses and
    resolves to a model registered in this framework."""
    import glob

    ref_dir = "/root/reference/configs"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tree not mounted")
    import vitxtgqa_tpu
    from vitxtgqa_tpu.core.registry import registry

    vitxtgqa_tpu.setup_imports()
    paths = sorted(glob.glob(os.path.join(ref_dir, "*.yml")))
    assert len(paths) == 7
    for path in paths:
        cfg = build_config(path)
        (model_key,) = list(cfg.model_attributes)
        assert model_key in registry.list("model"), (path, model_key)
        assert cfg.training_parameters.batch_size == 48


def test_serving_preset_layers_over_flagship(repo_root):
    """configs/t2s_serving.yml includes the flagship experiment config and
    pre-sets the recommended serving knobs."""
    from vitxtgqa_tpu.core.config import build_config

    cfg = build_config(os.path.join(repo_root, "configs", "t2s_serving.yml"))
    tp = cfg.training_parameters
    assert tp.evalai_inference is True
    assert tp.tpu.kv_cache_int8 is True and tp.tpu.compact_serving is True
    # the flagship model/dataset schema rides along unchanged
    assert int(cfg.model_attributes.t2s.mmt.num_hidden_layers) == 3
    assert "vtextgqa" in cfg.dataset_attributes
