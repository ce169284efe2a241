import math

import pytest

from instant_nsr_pl_tpu.config import (
    config_from_dict,
    load_config,
    merge_dotlist,
    ConfigNode,
)


def test_attribute_and_item_access():
    cfg = config_from_dict({"model": {"radius": 1.5, "geometry": {"feature_dim": 16}}})
    assert cfg.model.radius == 1.5
    assert cfg["model"]["geometry"]["feature_dim"] == 16
    assert cfg.model.get("missing", 7) == 7


def test_interpolation_path():
    cfg = config_from_dict(
        {"model": {"radius": 2.0, "geometry": {"radius": "${model.radius}"}}}
    )
    assert cfg.model.geometry.radius == 2.0


def test_resolvers():
    cfg = config_from_dict(
        {
            "a": 3,
            "b": "${add:${a},4}",
            "c": "${sub:10,${a}}",
            "d": "${mul:${a},3}",
            "e": "${idiv:7,2}",
            "g": "${calc_exp_lr_decay_rate:0.1,19500}",
        }
    )
    assert cfg.b == 7.0
    assert cfg.c == 7.0
    assert cfg.d == 9.0
    assert cfg.e == 3
    assert abs(cfg.g - 0.1 ** (1 / 19500)) < 1e-12
    # same value the reference uses in neus-blender.yaml
    assert abs(cfg.g**19500 - 0.1) < 1e-9


def test_string_interpolation():
    cfg = config_from_dict(
        {"dataset": {"scene": "lego"}, "name": "nerf-blender-${dataset.scene}"}
    )
    assert cfg.name == "nerf-blender-lego"


def test_mandatory_marker():
    cfg = config_from_dict({"dataset": {"scene": "???"}}, resolve=False)
    with pytest.raises(ValueError):
        _ = cfg.dataset.scene


def test_dotlist_merge():
    cfg = config_from_dict({"model": {"radius": 1.5}}, resolve=False)
    merge_dotlist(cfg, ["model.radius=3.0", "model.new.flag=true", "tag=abc"])
    assert cfg.model.radius == 3.0
    assert cfg.model.new.flag is True
    assert cfg.tag == "abc"


def test_load_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  radius: 1.5\n  r2: ${mul:${model.radius},2}\n")
    cfg = load_config(str(p), cli_args=["model.radius=2.0"])
    assert cfg.model.radius == 2.0
    assert cfg.model.r2 == 4.0


def test_nested_list_access():
    cfg = config_from_dict({"opt": {"betas": [0.9, 0.99], "ms": [[1, 2], [3]]}})
    assert cfg.opt.betas == [0.9, 0.99]
    assert cfg.opt.ms[0] == [1, 2]


def test_to_dict_roundtrip():
    d = {"a": {"b": [1, {"c": 2}]}, "e": "x"}
    assert config_from_dict(d).to_dict() == d
