"""Config system tests: layered merge, _replace, overrides, type checks."""

import pytest
import yaml

from luminoth_tpu.utils.config import (
    Config,
    cleanup_config,
    dump_config,
    get_model_config,
    load_config_files,
    merge_into,
    override_config_params,
    parse_config_value,
    parse_override,
)


def test_attribute_access():
    c = Config({"a": {"b": 1}, "c": [{"d": 2}]})
    assert c.a.b == 1
    assert c.c[0].d == 2
    c.a.b = 5
    assert c["a"]["b"] == 5


def test_merge_deep():
    base = Config({"train": {"lr": 0.1, "steps": 100}, "model": {"type": "ssd"}})
    new = Config({"train": {"lr": 0.2}})
    merged = merge_into(new, base, overwrite=True)
    assert merged.train.lr == 0.2
    assert merged.train.steps == 100


def test_merge_type_check():
    base = Config({"train": {"lr": 0.1}})
    with pytest.raises(ValueError):
        merge_into(Config({"train": {"lr": "high"}}), base, overwrite=True)


def test_merge_none_always_allowed():
    base = Config({"x": 3})
    merged = merge_into(Config({"x": None}), base, overwrite=True)
    assert merged.x is None


def test_merge_dict_over_none():
    # An empty YAML section parses to None; a later file filling it in
    # must deep-merge, not crash.
    base = Config({"a": {"weights": None}})
    merged = merge_into(Config({"a": {"weights": {"x": 1}}}), base)
    assert merged.a.weights.x == 1


def test_replace_subtree():
    base = Config({"optimizer": {"type": "momentum", "momentum": 0.9, "_replace": True}})
    new = Config({"optimizer": {"type": "adam"}})
    merged = merge_into(new, base, overwrite=True)
    assert merged.optimizer.type == "adam"
    assert "momentum" not in merged.optimizer


def test_cleanup_removes_replace():
    c = Config({"a": {"_replace": True, "x": 1}})
    cleanup_config(c)
    assert "_replace" not in c.a


def test_parse_override_values():
    assert parse_config_value("none") is None
    assert parse_config_value("True") is True
    assert parse_config_value("false") is False
    assert parse_config_value("3") == 3
    assert parse_config_value("3.5") == 3.5
    assert parse_config_value("resnet_v1_101") == "resnet_v1_101"

    d = parse_override(["train.learning_rate.value=0.001", "model.type=ssd"])
    assert d["train"]["learning_rate"]["value"] == 0.001
    assert d["model"]["type"] == "ssd"


def test_override_config_params():
    c = Config({"train": {"lr": 0.1}})
    c = override_config_params(c, ["train.lr=0.5"])
    assert c.train.lr == 0.5


def test_get_model_config_layering():
    base = Config({"model": {"type": "ssd", "depth": 3}, "train": {"lr": 0.1}})
    custom = Config({"train": {"lr": 0.2}})
    cfg = get_model_config(base, custom, ["model.depth=5"])
    assert cfg.model.depth == 5
    assert cfg.train.lr == 0.2
    # base must not be mutated
    assert base.model.depth == 3


def test_get_model_config_resolves_twice_identically():
    # cleanup_config strips _replace in place; if merge_into aliases the
    # custom subtree instead of copying, the SECOND resolve of the same
    # parsed config deep-merges what the first replaced wholesale.
    base = Config({
        "train": {"optimizer": {"type": "momentum", "momentum": 0.9}}
    })
    custom = Config({
        "train": {"optimizer": {"_replace": True, "type": "adam"}}
    })
    first = get_model_config(base, custom)
    second = get_model_config(base, custom)
    assert "momentum" not in first.train.optimizer
    assert "momentum" not in second.train.optimizer
    # and the caller's parsed config still carries its marker
    assert custom.train.optimizer["_replace"] is True


def test_load_config_files(tmp_path):
    p1 = tmp_path / "a.yml"
    p1.write_text(yaml.safe_dump({"train": {"lr": 0.1}, "model": {"type": "ssd"}}))
    p2 = tmp_path / "b.yml"
    p2.write_text(yaml.safe_dump({"train": {"lr": 0.9}}))
    cfg = load_config_files([str(p1), str(p2)])
    assert cfg.train.lr == 0.9
    assert cfg.model.type == "ssd"


def test_dump_round_trip():
    c = Config({"a": {"b": [1, 2, 3]}, "s": "x"})
    loaded = yaml.safe_load(dump_config(c))
    assert loaded == {"a": {"b": [1, 2, 3]}, "s": "x"}
