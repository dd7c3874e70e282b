#!/usr/bin/env bash
# End-of-round record snapshot (rounds 12-15 hygiene item: the
# bench/correctness/leak records sat uncommitted at judge time four
# rounds running). Stages exactly the per-round record files and
# commits them if anything changed. Safe to run any time:
#   bash tools/snapshot.sh
#
# Each record class is staged with its own `git add` so one class with
# no matching files cannot veto staging the others (round-15 advice: a
# single multi-pathspec add aborts wholesale on the first non-matching
# pathspec, and masking that error silently reproduced the exact
# uncommitted-records drift this script exists to fix). `ls` pre-checks
# existence; nothing is error-masked. COPYCHECK.json is NOT staged: it
# is gitignored (driver-owned), and under `set -e` an add of an ignored
# path aborts the script with everything staged but nothing committed —
# the round-16 failure mode.
set -euo pipefail
cd "$(dirname "$0")/.."
for spec in 'BENCH_*.json' 'CORRECTNESS_*.json' 'LEAKCHECK.json'; do
  if compgen -G "$spec" > /dev/null; then
    git add -A -- "$spec"
  fi
done
if git diff --cached --quiet; then
  echo "snapshot: records already committed"
else
  git commit -m "Snapshot round records (bench/correctness/leakcheck)"
  echo "snapshot: records committed"
fi
