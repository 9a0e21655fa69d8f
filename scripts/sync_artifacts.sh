#!/usr/bin/env bash
# Artifact sync between a pod/workstation and a remote store — the TPU
# analog of the reference's scripts/sync/ (ossutil ckpt/metadata/wandb
# shuttles between cluster, OSS and local).
#
# Remotes: gs://bucket/prefix (gcloud storage / gsutil), host:path (rsync
# over ssh), or a plain directory (rsync/cp — also how the smoke test runs).
#
# Usage:
#   scripts/sync_artifacts.sh push ckpts  [-j jobid] [-s step] [-r remote]
#   scripts/sync_artifacts.sh pull ckpts  -j jobid [-s step]
#   scripts/sync_artifacts.sh push data|logs|pretrained
#
# Local roots come from the global_env config conventions:
#   CKPT_ROOT (default ./workdir), DATA_ROOT (./data), LOG_ROOT
#   (./workdir/logs), PRETRAINED_ROOT (./pretrained).
# The remote defaults to $SYNC_REMOTE (set it in your pod env or pass -r).
set -euo pipefail

usage() {
  sed -n '2,16p' "$0" | sed 's/^# \{0,1\}//'
  exit 1
}

[ $# -ge 2 ] || usage
DIR_MODE="$1"; CATEGORY="$2"; shift 2
JOBID=""; STEP=""; REMOTE="${SYNC_REMOTE:-}"
while getopts "j:s:r:" opt; do
  case $opt in
    j) JOBID="$OPTARG" ;;
    s) STEP="$OPTARG" ;;
    r) REMOTE="$OPTARG" ;;
    *) usage ;;
  esac
done
[ -n "$REMOTE" ] || { echo "no remote: set SYNC_REMOTE or pass -r" >&2; exit 1; }

case "$CATEGORY" in
  ckpts)      LOCAL="${CKPT_ROOT:-./workdir}" ;;
  data)       LOCAL="${DATA_ROOT:-./data}" ;;
  logs)       LOCAL="${LOG_ROOT:-./workdir/logs}" ;;
  pretrained) LOCAL="${PRETRAINED_ROOT:-./pretrained}" ;;
  *) usage ;;
esac

SUB="$CATEGORY"
if [ -n "$JOBID" ]; then
  LOCAL="$LOCAL/$JOBID"; SUB="$SUB/$JOBID"
fi
if [ -n "$STEP" ]; then
  # checkpoint layout: <ckpt_dir>/<step>/ (Orbax); sync one step only
  LOCAL="$LOCAL/$STEP"; SUB="$SUB/$STEP"
fi
DEST="$REMOTE/$SUB"

if [ "$DIR_MODE" = push ]; then SRC="$LOCAL"; DST="$DEST";
elif [ "$DIR_MODE" = pull ]; then SRC="$DEST"; DST="$LOCAL";
else usage; fi

log() { echo "[sync $(date +%H:%M:%S)] $*"; }

is_gcs() { case "$1" in gs://*) return 0 ;; *) return 1 ;; esac; }

if is_gcs "$SRC" || is_gcs "$DST"; then
  if command -v gcloud >/dev/null 2>&1; then
    log "gcloud storage rsync $SRC -> $DST"
    gcloud storage rsync -r "$SRC" "$DST"
  elif command -v gsutil >/dev/null 2>&1; then
    log "gsutil rsync $SRC -> $DST"
    gsutil -m rsync -r "$SRC" "$DST"
  else
    echo "gs:// remote but neither gcloud nor gsutil installed" >&2; exit 1
  fi
else
  if [ "$DIR_MODE" = pull ]; then mkdir -p "$DST"; fi
  if command -v rsync >/dev/null 2>&1; then
    log "rsync $SRC/ -> $DST/"
    rsync -a --partial "$SRC/" "$DST/"
  else
    # minimal fallback (also exercised by the smoke test on bare images)
    log "cp -r $SRC -> $DST (rsync unavailable)"
    mkdir -p "$DST"
    cp -r "$SRC/." "$DST/"
  fi
fi
log "done: $DIR_MODE $CATEGORY ($SRC -> $DST)"
