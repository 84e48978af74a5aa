#!/usr/bin/env bash
# The hard-recipe ablation matrix: every arm x seed sequentially (the
# chip serializes anyway), then a summary table with bootstrap CIs.
#
#   bash recipes/hard/ablate.sh [work_dir]
#
# Baseline gets 3 seeds (training-seed spread estimate), each ablation
# arm 2.  Results: $work/ABLATION.md + per-run wer_ci.json.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
work=${1:-/tmp/kctpu_hard}
export work

run_one() {
  local a=$1 s=$2
  if [ -f "$work/$a.s$s/wer_ci.json" ]; then
    echo "=== $a.s$s already done, skipping"
    return 0
  fi
  echo "=== ablate: arm=$a seed=$s"
  arm=$a seed=$s bash run.sh
}

run_one baseline 0
run_one baseline 1
run_one baseline 2
run_one realign 0
run_one realign 1
run_one ng 0
run_one ng 1
run_one ds2 0
run_one ds2 1
run_one bf16 0
run_one bf16 1

python summarize_ablation.py "$work" | tee "$work/ABLATION.md"
