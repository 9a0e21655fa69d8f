import os

import pytest

from prometheus_tpu.config import Config, deep_merge, load_config, resolve_interpolations

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..",
                           "prometheus_tpu", "configs", "config.yaml")


def test_deep_merge():
    a = {"x": {"y": 1, "z": 2}, "k": [1, 2]}
    b = {"x": {"y": 10}, "k": [3]}
    out = deep_merge(a, b)
    assert out == {"x": {"y": 10, "z": 2}, "k": [3]}


def test_config_attr_access():
    c = Config({"a": {"b": {"c": 5}}})
    assert c.a.b.c == 5
    assert c.get_path("a.b.c") == 5
    assert c.get_path("a.b.missing", "d") == "d"
    c.set_path("a.b.d", 7)
    assert c.a.b.d == 7


def test_interpolation_whole_and_partial():
    c = Config({"image_size": 256, "net": {"size": "${image_size}",
                                           "name": "img${image_size}"}})
    out = resolve_interpolations(c)
    assert out.net.size == 256          # type preserved
    assert out.net.name == "img256"     # string substitution


def test_load_flagship_config():
    cfg = load_config(CONFIG_ROOT)
    assert cfg.algorithm.network.model_channels == 320
    assert cfg.algorithm.network.extra_latent_channel == 11
    assert cfg.gsdecoder.network.cross_view_dit.hidden_size == 1152
    assert cfg.training.batch_size == 8
    assert cfg.training.num_input_views == 8
    # interpolation across groups
    assert cfg.algorithm.network.image_size == 256
    # dataset group references training values
    assert cfg.dataset.num_input_views == 8
    # _global_ overlay applied at root
    assert cfg.mesh_axes == ["data"]
    assert cfg.experiment.scheduler_type == "vprediction"


def test_overrides():
    cfg = load_config(CONFIG_ROOT, overrides=[
        "training.batch_size=4", "image_size=512", "debug=true"])
    assert cfg.training.batch_size == 4
    assert cfg.debug is True
    assert cfg.algorithm.network.image_size == 512


def test_group_selection_override():
    """An override naming a config GROUP swaps that group's file (Hydra-like
    `global_env=tpu_pod`), composing the pod environment overlay."""
    cfg = load_config(CONFIG_ROOT, overrides=[
        "global_env=tpu_pod", "training.batch_size=2"])
    assert cfg.mesh_axes == ["dcn", "data"]          # pod overlay applied
    assert cfg.output_dir.startswith("/mnt/")
    assert cfg.chosen.global_env == "tpu_pod"
    assert cfg.training.batch_size == 2              # value overrides still work
    # experiment group swap composes too
    cfg2 = load_config(CONFIG_ROOT, overrides=["experiment=gsdecoder_exp"])
    assert cfg2.chosen.experiment == "gsdecoder_exp"
