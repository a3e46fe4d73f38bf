import textwrap

import pytest
import yaml

from tclight_tpu.config import (
    ConfigDict,
    load_config,
    merge,
    normalize_prompts,
    prompt_tag,
    resolve,
    save_config,
)


def write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return p


def test_merge_nested():
    base = ConfigDict({"a": 1, "b": {"x": 1, "y": 2}})
    over = ConfigDict({"b": {"y": 3, "z": 4}, "c": 5})
    out = merge(base, over)
    assert out.a == 1 and out.b.x == 1 and out.b.y == 3 and out.b.z == 4 and out.c == 5


def test_interpolation():
    cfg = ConfigDict(
        {"work_dir": "wd", "inversion": {"save_path": "${work_dir}/latents"},
         "generation": {"latents_path": "${inversion.save_path}"}}
    )
    out = resolve(cfg)
    assert out.inversion.save_path == "wd/latents"
    assert out.generation.latents_path == "wd/latents"


def test_base_config_chain(tmp_path):
    write(tmp_path, "base.yaml", """
        a: 1
        b: {x: 10}
    """)
    leaf = write(tmp_path, "leaf.yaml", """
        base_config: base.yaml
        b: {y: 20}
        work_dir: %s
        data: {rgb_path: vid.mp4}
        generation: {prompt: "sunset glow"}
    """ % (tmp_path / "wd"))
    cfg = load_config(["--config", str(leaf)])
    assert cfg.a == 1 and cfg.b.x == 10 and cfg.b.y == 20
    assert cfg.generation.prompt == {"sunset_glow": "sunset glow"}
    assert "sunset_glow-00000" in cfg.work_dir


def test_cli_overrides(tmp_path):
    leaf = write(tmp_path, "c.yaml", """
        work_dir: %s
        data: {rgb_path: a.mp4}
        generation: {prompt: null, chunk_size: 4, alpha_t: 0.0, frame_range: [0, 30, 1]}
    """ % (tmp_path / "wd"))
    cfg = load_config(
        ["--config", str(leaf), "-i", "other.mp4", "-p", "neon city", "-n", "8",
         "--multi_axis", "generation.chunk_size=2"]
    )
    assert cfg.data.rgb_path == "other.mp4"
    assert cfg.generation.frame_range == [0, 8, 1]
    assert cfg.generation.alpha_t == 0.4
    assert cfg.generation.chunk_size == 2
    assert list(cfg.generation.prompt.values()) == ["neon city"]


def test_prompt_normalization_dict_passthrough():
    cfg = ConfigDict({"generation": {"prompt": {"style": "noir"}}})
    out = normalize_prompts(cfg)
    assert out.generation.prompt == {"style": "noir"}
    cfg2 = normalize_prompts(ConfigDict({"generation": {"prompt": None}}))
    assert cfg2.generation.prompt == {"default": None}


def test_prompt_tag():
    assert prompt_tag("A man, walking: slowly!") == "A_man_walking_slowly"
    assert prompt_tag(None) == "default"


def test_save_config_strips_inversion(tmp_path):
    cfg = ConfigDict({"seed": 1, "inversion": {"x": 1}, "generation": {"y": 2}})
    out = tmp_path / "cfg.yaml"
    save_config(cfg, out)
    data = yaml.safe_load(out.read_text())
    assert "inversion" not in data and data["generation"]["y"] == 2
    assert cfg.inversion.x == 1  # original untouched


def test_workdir_versioning(tmp_path):
    leaf = write(tmp_path, "c.yaml", """
        work_dir: %s
        data: {rgb_path: a.mp4}
        generation: {prompt: p}
    """ % (tmp_path / "wd"))
    cfg1 = load_config(["--config", str(leaf)])
    import os
    os.makedirs(cfg1.work_dir)
    cfg2 = load_config(["--config", str(leaf)])
    assert cfg2.work_dir != cfg1.work_dir
    assert cfg2.work_dir.endswith("p-00001")
