#!/usr/bin/env bash
# One-command TPU-pod launch runbook — the L9 deployment recipe
# (reference ships the CUDA equivalent as Dockerfile +
# docker-compose.yml:17-25; on TPU there is no per-device launcher, the
# recipe is "run the same command on every host with the multihost flag").
#
# Two modes:
#
#   1. From your workstation, against a Cloud TPU pod (runs the training
#      command on EVERY host via gcloud --worker=all):
#
#        scripts/launch_pod.sh --tpu my-v5e-8 --zone us-west4-a \
#            [--project P] [--repo /path/on/hosts] \
#            -- -cfg configs/gtav/source_target.yaml [KEY VALUE ...]
#
#   2. On a pod host itself (inside a gcloud ssh session, a batch
#      scheduler, or a single-host board) — everything after `--` goes to
#      train.py verbatim:
#
#        scripts/launch_pod.sh -- -cfg configs/gtav/source_target.yaml
#
# Either way the launched command is exactly:
#
#   HALO_MULTIHOST=<0|1> python train.py <args>
#
# HALO_MULTIHOST=1 makes train.py call jax.distributed.initialize()
# before any device access (train.py:13-16); it is set automatically when
# --tpu targets more than one worker, and can be forced with
# --multihost 0|1. Requirements the script checks/reminds:
#   * OUTPUT_DIR must be shared storage in multihost runs (masks,
#     checkpoints and metrics.jsonl flow through it — docs/ENVIRONMENT.md).
#   * the repo must exist at the same path on every host (--repo).
#
# --dry-run prints the exact command(s) without executing — the CI-tested
# contract (tests/test_offline_tools.py::test_launch_pod_script).

set -euo pipefail

TPU="" ZONE="" PROJECT="" REPO="" DRY=0 MULTIHOST=""
TRAIN_ARGS=()

usage() { sed -n '2,35p' "$0" | sed 's/^# \{0,1\}//'; }

while [[ $# -gt 0 ]]; do
  case "$1" in
    --tpu)       TPU="$2"; shift 2 ;;
    --zone)      ZONE="$2"; shift 2 ;;
    --project)   PROJECT="$2"; shift 2 ;;
    --repo)      REPO="$2"; shift 2 ;;
    --multihost) MULTIHOST="$2"; shift 2 ;;
    --dry-run)   DRY=1; shift ;;
    -h|--help)   usage; exit 0 ;;
    --)          shift; TRAIN_ARGS=("$@"); break ;;
    *) echo "launch_pod.sh: unknown option $1 (args after -- go to train.py)" >&2
       exit 2 ;;
  esac
done

if [[ ${#TRAIN_ARGS[@]} -eq 0 ]]; then
  echo "launch_pod.sh: no train.py args — pass them after --, e.g." >&2
  echo "  scripts/launch_pod.sh -- -cfg configs/gtav/source_target.yaml" >&2
  exit 2
fi

run() {
  if [[ $DRY -eq 1 ]]; then
    printf 'DRY-RUN:'; printf ' %q' "$@"; printf '\n'
  else
    "$@"
  fi
}

if [[ -n "$TPU" ]]; then
  # Remote mode: one gcloud invocation fans the identical command out to
  # every worker (the TPU-pod analogue of compose's 8-GPU reservation).
  [[ -n "$ZONE" ]] || { echo "launch_pod.sh: --tpu requires --zone" >&2; exit 2; }
  REPO="${REPO:-\$HOME/halo_tpu}"
  MULTIHOST="${MULTIHOST:-1}"
  CMD="cd $REPO && HALO_MULTIHOST=$MULTIHOST python train.py"
  for a in "${TRAIN_ARGS[@]}"; do CMD+=$(printf ' %q' "$a"); done
  GC=(gcloud compute tpus tpu-vm ssh "$TPU" --zone "$ZONE" --worker=all)
  [[ -n "$PROJECT" ]] && GC+=(--project "$PROJECT")
  GC+=(--command "$CMD")
  echo "launch_pod.sh: launching on every worker of $TPU ($ZONE):"
  echo "  $CMD"
  echo "  (OUTPUT_DIR must be shared storage across hosts — docs/ENVIRONMENT.md)"
  run "${GC[@]}"
else
  # Local mode: this host is one pod worker (or a single-host board).
  # Default multihost from the TPU runtime's own worker count when
  # available; 0 otherwise.
  if [[ -z "$MULTIHOST" ]]; then
    if [[ -n "${TPU_WORKER_HOSTNAMES:-}" && "${TPU_WORKER_HOSTNAMES}" == *,* ]]; then
      MULTIHOST=1
    else
      MULTIHOST=0
    fi
  fi
  run env HALO_MULTIHOST="$MULTIHOST" python train.py "${TRAIN_ARGS[@]}"
fi
