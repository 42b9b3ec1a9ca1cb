#!/bin/bash
# Interleaved same-host A/B: current HEAD vs a pinned base commit, N full
# bench.py runs each, alternating. Usage: samehost_ab.sh <base_sha> <runs>
set -u
BASE=${1:?base sha}
RUNS=${2:-2}
WT=/tmp/ab_base_wt
OUT=/tmp/samehost_ab
mkdir -p "$OUT"
if [ ! -d "$WT" ]; then
  git -C /root/repo worktree add --detach "$WT" "$BASE" || exit 1
fi
for i in $(seq 1 "$RUNS"); do
  for tree in head base; do
    if [ "$tree" = head ]; then d=/root/repo; else d=$WT; fi
    echo "== run $i tree $tree =="
    (cd "$d" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      timeout 2400 python bench.py \
      2>"$OUT/${tree}_${i}.stderr" >"$OUT/${tree}_${i}.json")
    echo "   exit=$?"
  done
done
echo done
