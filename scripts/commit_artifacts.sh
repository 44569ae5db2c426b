#!/bin/bash
# VERDICT r9 #5: the working tree held the only copy of the good r9 bench
# run while git showed a worse mid-round artifact.  Run this after the
# round's LAST bench/sweep so the final artifact set is what the judge
# reads from history.  Usage: scripts/commit_artifacts.sh [message]
set -e
cd "$(dirname "$0")/.."
FILES=""
for f in BENCH_r*.json BENCH_QUIET_r*.json BENCH_COMPARE.json \
         BENCH_FULL.json CORRECTNESS_r*.json PARITY_r*.json \
         SYNTH_SWEEP_r*.json; do
  [ -e "$f" ] && FILES="$FILES $f"
done
git add $FILES
if git diff --cached --quiet; then
  echo "artifacts already committed — tree clean"
else
  git commit -m "${1:-Commit final bench/correctness artifact set}"
  echo "committed: $(git log --oneline -1)"
fi
