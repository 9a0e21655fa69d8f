#!/usr/bin/env python
"""Convert the published torch ``full.ckpt`` bundle into framework params.

Parity target: the inverse of ``/root/reference/tools/create_finalckpt.py``
plus the per-tower key conversions the reference does at load time
(``convert_diffuser_to_origin.py``, ``mv_ldm.py:86-131``). Produces an Orbax
checkpoint directory consumable by ``inference.py --ckpt`` (which can also
consume the raw ``full.ckpt`` directly via the same ``convert_bundle``).

Usage:
    python tools/convert_ckpt.py --full_ckpt pretrained/full.ckpt \
        --out pretrained/orbax_full [--small]

Conversion report: every source tensor is either mapped or listed as
missing/unassigned/skipped (loud, not silent) so parity gaps are visible
per tower. The conversion core lives in ``prometheus_tpu.checkpoint``
(``convert_bundle``) and is exercised end-to-end against real reference
modules in ``tests/test_full_bundle_conversion.py``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Re-exported for backward compatibility (tests import these from here).
from prometheus_tpu.checkpoint import (convert_bundle, convert_tower,  # noqa: E402,F401
                                       map_trajdit_key)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--full_ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax

    from bench import build_flagship
    from prometheus_tpu.checkpoint import save_checkpoint, split_full_ckpt

    towers = split_full_ckpt(args.full_ckpt)
    pipe, _ = build_flagship(small=args.small)
    report = convert_bundle(towers, pipe)

    state = {
        "mvldm": jax.tree.map(np.asarray, pipe.mvldm_params),
        "traj": jax.tree.map(np.asarray, pipe.traj_params),
        "gsdecoder": jax.tree.map(np.asarray, pipe.gsdecoder_vars),
    }
    save_checkpoint(args.out, state, step=0)
    with open(os.path.join(args.out, "conversion_report.json"), "w") as fp:
        json.dump(report, fp, indent=2)
    print(json.dumps({k: {kk: (len(vv) if isinstance(vv, list) else vv)
                          for kk, vv in v.items()} for k, v in report.items()},
                     indent=2))


if __name__ == "__main__":
    main()
