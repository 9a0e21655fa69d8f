"""Config system: YAML group composition with Hydra-like semantics.

Functional replacement for the reference's Hydra setup
(``/root/reference/configurations/`` + ``train.py:35-48``): a root config
names one file per group (``experiment``, ``dataset``, ``algorithm``,
``algorithm@gsdecoder``, ``global_env``, ``refiner``); groups are loaded from
``configs/<group>/<name>.yaml``, deep-merged, ``${a.b.c}`` interpolations are
resolved, and dotted CLI overrides (``training.batch_size=4``) are applied
last. The composed config is a plain attribute-dict (pickles cleanly, hashes
by content) that is stored alongside checkpoints so inference can
re-instantiate systems from the checkpoint alone.
"""
from __future__ import annotations

import copy
import os
import re
from typing import Any

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


class Config(dict):
    """dict with attribute access, recursive over nested dicts."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) else v

    def __setattr__(self, k, v):
        self[k] = v

    def get_path(self, dotted: str, default=None):
        cur: Any = self
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur

    def set_path(self, dotted: str, value):
        parts = dotted.split(".")
        cur = self
        for p in parts[:-1]:
            nxt = cur.get(p)
            if not isinstance(nxt, dict):
                nxt = Config()
                cur[p] = nxt
            cur = nxt
        cur[parts[-1]] = value


def deep_merge(base: dict, override: dict) -> dict:
    """Recursive dict merge; override wins; lists replaced wholesale."""
    out = copy.deepcopy(dict(base))
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_scalar(s: str):
    return yaml.safe_load(s)


def resolve_interpolations(cfg: Config, max_passes: int = 10) -> Config:
    """Resolve ``${dotted.path}`` references against the root config."""

    def subst(value, root):
        if isinstance(value, str):
            m = _INTERP.fullmatch(value)
            if m:  # whole-string reference: keep the referee's type
                ref = root.get_path(m.group(1))
                return value if ref is None else ref
            return _INTERP.sub(
                lambda mm: str(root.get_path(mm.group(1), mm.group(0))), value)
        if isinstance(value, dict):
            return {k: subst(v, root) for k, v in value.items()}
        if isinstance(value, list):
            return [subst(v, root) for v in value]
        return value

    for _ in range(max_passes):
        new = Config(subst(dict(cfg), cfg))
        if new == cfg:
            return new
        cfg = new
    return cfg


def _load_yaml(path: str) -> dict:
    with open(path) as fp:
        return yaml.safe_load(fp) or {}


GROUPS = ("global_env", "experiment", "dataset", "algorithm", "refiner")


def load_config(root_path: str, overrides: list[str] | None = None) -> Config:
    """Compose a config from a root YAML + its named groups + CLI overrides.

    The root file holds a ``defaults`` mapping: ``{group_name: file_stem}``
    (plus ``gsdecoder: <algorithm file>`` for the second algorithm slot,
    mirroring ``algorithm@gsdecoder``). Group files live next to the root in
    ``<group>/<stem>.yaml``.
    """
    root_dir = os.path.dirname(os.path.abspath(root_path))
    root = _load_yaml(root_path)
    defaults = root.pop("defaults", {})
    cfg: dict = root

    # Hydra-like group selection: an override whose key names a group (or
    # the gsdecoder slot) swaps that group's file before composition, e.g.
    # ``--override global_env=tpu_pod experiment=gsdecoder_exp``.
    value_overrides = []
    for ov in overrides or []:
        k = ov.split("=", 1)[0]
        if k in GROUPS or k == "gsdecoder":
            defaults[k] = ov.split("=", 1)[1] or None
        else:
            value_overrides.append(ov)
    overrides = value_overrides

    for group, stem in defaults.items():
        if stem is None:
            continue
        actual_group = "algorithm" if group == "gsdecoder" else group
        path = os.path.join(root_dir, actual_group, f"{stem}.yaml")
        data = _load_yaml(path)
        # group-internal defaults chain (one level, like `defaults: [base_algo]`)
        for parent in data.pop("defaults", []) or []:
            pdata = _load_yaml(os.path.join(root_dir, actual_group, f"{parent}.yaml"))
            pdata.pop("defaults", None)
            data = deep_merge(pdata, data)
        if data.pop("_global_", False):  # @package _global_ overlay
            cfg = deep_merge(cfg, data)
        else:
            cfg = deep_merge(cfg, {group: data})
        cfg.setdefault("chosen", {})[group] = stem

    # hoist experiment.training -> cfg.training BEFORE overrides and
    # interpolation: cfg.training is the canonical block consumers (and
    # overrides) target, and ${training.*} references must resolve
    # (reference train.py:44-46 semantics).
    if "experiment" in cfg and isinstance(cfg["experiment"], dict) \
            and "training" in cfg["experiment"]:
        cfg["training"] = deep_merge(cfg.get("training", {}),
                                     cfg["experiment"]["training"])

    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        k, v = ov.split("=", 1)
        c = Config(cfg)
        c.set_path(k, _parse_scalar(v))
        cfg = dict(c)

    return resolve_interpolations(Config(cfg))


def save_config(cfg: Config, path: str):
    with open(path, "w") as fp:
        yaml.safe_dump(dict(cfg), fp, sort_keys=False)
