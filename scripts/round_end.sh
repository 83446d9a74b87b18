#!/bin/bash
# Round-end artifact refresh (round-10 verdict #2): regenerate every
# machine-produced number the README status block splices in, so the
# block at the snapshot commit always equals the HEAD artifacts and can
# never drift by hand again (it drifted in rounds 7, 8 and 10).
#
#   1. full ScalaTest run      -> target/test-reports/*.xml
#   2. full bench at sf0.1     -> target/bench_full.json + benchgate
#   3. scripts/update_readme_status.py  (refuses stale/failing inputs)
#
# Run this as the LAST step of a round, then commit README.md.
set -euo pipefail
cd "$(dirname "$0")/.."

# tee the run log: ScalaTest's "Tests: succeeded N" line is THE test
# counter (round-13 verdict #7) — README, SURVEY §8, and the round-end
# commit message all quote it via update_readme_status.py
mkdir -p target
sbt -batch test | tee target/test_run.log

SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch 'runMain graft.Bench'
python3 scripts/benchgate.py 30

python3 scripts/update_readme_status.py
echo "round_end: README status regenerated from HEAD artifacts"
