"""Config-driven dataset construction (the reference's ``import_str`` wiring).

Builds dataset trees from the composed config's ``dataset.train``/``val``
nodes: ``{module: <registry name>, args: {...}}`` for leaf datasets,
``{module: ProbDataset, datasets: [...], probs: [...]}`` /
``{module: JointDataset, datasets: [...]}`` for mixers
(reference: ``train.py:99-121`` + ``configurations/dataset/*``).
"""
from __future__ import annotations

from typing import Any


def build_dataset(node: dict, common: dict | None = None):
    """Recursively build a dataset from a config node.

    ``common``: kwargs merged into every leaf dataset's args (img_size,
    num_input_views, ... hoisted from the dataset group level).
    """
    from . import DATASET_REGISTRY, JointDataset, ProbDataset

    common = dict(common or {})
    name = node["module"].rsplit(".", 1)[-1]
    if name == "JointDataset":
        children = [build_dataset(c, common) for c in node["datasets"]]
        return JointDataset(children, fake_length=node.get("fake_length", -1))
    if name == "ProbDataset":
        children = [build_dataset(c, common) for c in node["datasets"]]
        return ProbDataset(children, probs=node.get("probs"),
                           fake_length=node.get("fake_length", -1))
    cls = DATASET_REGISTRY[name]
    args = dict(node.get("args", {}))
    accepted = _accepted_kwargs(cls)
    for k, v in common.items():
        # group-level settings only apply where the class takes them — e.g.
        # a Text2ImageDataset child of a JointDataset must not receive the
        # multi-view num_input_views/num_novel_views knobs
        if accepted is None or k in accepted:
            args.setdefault(k, v)
    return cls(**args)


def _accepted_kwargs(cls) -> set | None:
    """Keyword names accepted anywhere in the class's __init__ MRO; None if
    a bare **kwargs sink makes the set unknowable."""
    import inspect

    names: set = set()
    for c in cls.__mro__:
        init = c.__dict__.get("__init__")
        if init is None:
            continue
        sig = inspect.signature(init)
        has_var_kw = False
        for p in sig.parameters.values():
            if p.kind == inspect.Parameter.VAR_KEYWORD:
                has_var_kw = True
            elif p.name != "self":
                names.add(p.name)
        if not has_var_kw:
            return names
    return names


def common_kwargs_from_group(ds_cfg: dict) -> dict:
    """Hoist the shared dataset-group settings into leaf kwargs."""
    out: dict[str, Any] = {}
    for k in ("img_size", "image_size", "num_input_views", "num_novel_views",
              "normalized_cameras", "use_caption"):
        if k in ds_cfg and ds_cfg[k] is not None:
            out["img_size" if k == "image_size" else k] = ds_cfg[k]
    return out
