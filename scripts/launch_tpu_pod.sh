#!/usr/bin/env bash
# Multi-host TPU pod launcher (the reference's scripts/dist_train.sh analog).
#
# On a TPU pod slice, every host runs the same program; JAX discovers peers
# through the TPU runtime (no torchrun/accelerate rendezvous needed). Use
# with `gcloud compute tpus tpu-vm ssh --worker=all --command=...` or your
# cluster's fan-out tool.
#
#   ./scripts/launch_tpu_pod.sh train.py --stage mvldm --synthetic
set -euo pipefail

export JAX_PLATFORMS=${JAX_PLATFORMS:-tpu}
# Keep host-side compile parallelism sane on small VMs.
export TPU_LIBRARY_LOAD_TIMEOUT_S=${TPU_LIBRARY_LOAD_TIMEOUT_S:-300}

cd "$(dirname "$0")/.."
exec python "$@"
