#!/usr/bin/env bash
# Standing nulls oracle gate (NULLS.md): regenerate the null-injected
# sf0.01 variant, dump every catalog query on it, and re-run the full
# DuckDB oracle comparison. Run each round BEFORE the end-of-round
# snapshot — it has caught at least one real cross-engine null
# divergence per round since it was introduced.
#
# Usage: tools/nulls_gate.sh [srcSfDir]   (default /root/testdata/sf0.01)
# Exit 0 = every oracle-checked query passes on null-bearing data.
set -euo pipefail
cd "$(dirname "$0")/.."

SRC="${1:-/root/testdata/sf0.01}"
DATA=/tmp/testdata_nulls
OUT=/tmp/verify_nulls

python3 tools/gen_nulls.py "$SRC" "$DATA"
rm -rf "$OUT"   # stale parquet once masked a regression
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt "runMain graft.Verify $DATA $OUT"
python3 tools/check.py "$DATA" "$OUT"
