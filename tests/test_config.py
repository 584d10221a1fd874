import os

import pytest

from real3dportrait_tpu.config import FrozenConfig, load_config, parse_overrides


def test_frozen_config_basic():
    cfg = FrozenConfig({"a": 1, "b": {"c": [1, {"d": 2}]}})
    assert cfg.a == 1
    assert cfg.b.c[1].d == 2
    assert cfg["b"]["c"][0] == 1
    assert cfg.get("missing", 7) == 7
    with pytest.raises(TypeError):
        cfg.a = 2
    d = cfg.to_dict()
    assert d["b"]["c"][1] == {"d": 2}
    assert hash(cfg) == hash(FrozenConfig(d))


def test_replace_dotted():
    cfg = FrozenConfig({"a": {"b": 1}, "x": 0})
    cfg2 = cfg.replace_dotted({"a.b": 5, "a.new": 6, "y": 7})
    assert cfg.a.b == 1
    assert cfg2.a.b == 5 and cfg2.a.new == 6 and cfg2.y == 7


def test_parse_overrides():
    ov = parse_overrides("a.b=1,c=true,d=3.5,e=[1,2,3],f=hello,g=none")
    assert ov == {"a.b": 1, "c": True, "d": 3.5, "e": [1, 2, 3], "f": "hello", "g": None}


def test_yaml_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("lr: 1.0\nmodel:\n  dim: 8\n  depth: 2\n")
    child = tmp_path / "child.yaml"
    child.write_text("base_config: ./base.yaml\nmodel:\n  dim: 16\nextra: yes\n")
    cfg = load_config(str(child), overrides="model.depth=4")
    assert cfg.lr == 1.0
    assert cfg.model.dim == 16
    assert cfg.model.depth == 4
    assert cfg.extra is True


def test_save_roundtrip(tmp_path):
    cfg = FrozenConfig({"a": 1, "b": {"c": 2}})
    p = os.path.join(tmp_path, "cfg.yaml")
    cfg.save(p)
    assert load_config(p) == cfg


def test_repo_configs_load():
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
    for name in os.listdir(root):
        if name.endswith(".yaml"):
            cfg = load_config(os.path.join(root, name))
            assert len(cfg) > 0
