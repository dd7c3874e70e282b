#!/usr/bin/env bash
# End-of-round record snapshot (rounds 12-14 hygiene item: the
# bench/correctness/leak records sat uncommitted at judge time three
# rounds running). Stages exactly the per-round record files and
# commits them if anything changed. Safe to run any time:
#   bash tools/snapshot.sh
set -euo pipefail
cd "$(dirname "$0")/.."
git add -A -- 'BENCH_*.json' 'CORRECTNESS_*.json' LEAKCHECK.json \
  COPYCHECK.json 2>/dev/null || true
if git diff --cached --quiet; then
  echo "snapshot: records already committed"
else
  git commit -m "Snapshot round records (bench/correctness/leakcheck)"
  echo "snapshot: records committed"
fi
