#!/usr/bin/env bash
# Force-add a training run's evidence to git (logs/ is gitignored, and the
# build machines are reset between rounds — round 4 session 1 lost the
# VMASWheel and bf16-MPETarget artifact logs that PARITY.md cites, which is
# why every artifact run's evidence is now committed as it completes).
#
# Usage: scripts/archive_run_evidence.sh <run_dir> [final_step] [extra files...]
#   run_dir     e.g. logs/LidarOmniTarget/dgppo/seed0_820042039_IBIW
#   final_step  models/<step> checkpoint to keep (default: highest step)
#   extra       e.g. the nohup train log at logs/r4omni_train.log
set -euo pipefail
run_dir=$1
shift || true
step=${1:-}
if [[ -n "${step:-}" && -d "$run_dir/models/$step" ]]; then
  shift
elif [[ "${step:-}" =~ ^[0-9]+$ ]]; then
  # Looks like a step but models/<step> is missing: a typo would otherwise
  # fall through to the extra-files loop and die on an unrelated-path error.
  echo "error: no such checkpoint $run_dir/models/$step" >&2
  exit 1
else
  step=$(ls "$run_dir/models" 2>/dev/null | sort -n | tail -1 || true)
fi
git add -f "$run_dir/config.yaml" "$run_dir/metrics.jsonl"
if [[ -n "$step" ]]; then
  git add -f "$run_dir/models/$step"
  # full-state checkpoint (optimizer/PRNG/lagr/step) enables --load-full resume
  if [[ -d "$run_dir/ckpt" ]]; then
    [[ -d "$run_dir/ckpt/full_$step" ]] && git add -f "$run_dir/ckpt/full_$step"
  fi
fi
for f in "$@"; do git add -f "$f"; done
echo "staged evidence for $run_dir (final step: ${step:-none}); commit it yourself"
