#!/usr/bin/env bash
# Periodically commit a training run's IN-FLIGHT evidence (metrics.jsonl +
# config.yaml + optional extra files) without touching anything else in the
# git index. Round snapshots have stranded long runs twice (PARITY.md
# evidence-loss note; the r4 seed-42 rescue run's 7,200 s of metrics was
# uncommitted at round end — VERDICT r4 weak #2 / next #7). Run this from
# cron/a watcher at eval cadence so killing a run mid-flight leaves
# committed evidence no older than the archive interval.
#
# Usage: scripts/archive_inflight.sh <run_dir> [extra files...]
set -euo pipefail
run_dir=$1
shift || true
files=("$run_dir/config.yaml" "$run_dir/metrics.jsonl")
for f in "$@"; do files+=("$f"); done

cd "$(dirname "$0")/.."
git add -f -- "${files[@]}"
if [[ -z "$(git status --porcelain -- "${files[@]}")" ]]; then
  echo "inflight archive: no changes for $run_dir"
  exit 0
fi
# Pathspec commit: records the working-tree state of ONLY these paths,
# leaving any other staged work in the index for its own commit.
git commit -q -m "inflight evidence: $(basename "$run_dir") @ $(date -u +%Y-%m-%dT%H:%MZ)" -- "${files[@]}"
echo "inflight archive: committed $(git rev-parse --short HEAD) for $run_dir"
