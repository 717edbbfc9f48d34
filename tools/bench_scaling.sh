#!/usr/bin/env bash
# Scaling-efficiency evidence (BASELINE.md): run the identical Bench job at
# local[8] and local[32] on the same input; efficiency = (T8/T32)/4 on the
# flagship pipeline. Warm-up run discarded, median of 3 per level.
#
# Usage: tools/bench_scaling.sh [sfDir]  (default /root/testdata/sf0.1)
set -euo pipefail
SF="${1:-/root/testdata/sf0.1}"
cd /root/repo

# one compile up front so timed runs are runtime-only
sbt -batch compile > /dev/null 2>&1 || { echo "compile failed" >&2; exit 1; }

run_once() { # $1 = cpus → prints flagship_sec
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$1" \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | python3 -c 'import json,sys; print(json.load(sys.stdin)["flagship_sec"])'
}

median3() { printf '%s\n' "$@" | sort -g | sed -n 2p; }

for CPUS in 8 32; do
  run_once "$CPUS" > /dev/null   # warm-up (JIT + page cache), discarded
  R1=$(run_once "$CPUS"); R2=$(run_once "$CPUS"); R3=$(run_once "$CPUS")
  M=$(median3 "$R1" "$R2" "$R3")
  echo "cpus=$CPUS runs=[$R1,$R2,$R3] median=$M"
  eval "T$CPUS=$M"
done

python3 - "$T8" "$T32" <<'EOF'
import sys
t8, t32 = float(sys.argv[1]), float(sys.argv[2])
eff = (t8 / t32) / 4
print(f"T8={t8:.2f}s T32={t32:.2f}s speedup={t8/t32:.2f}x efficiency={eff:.3f} (target >= 0.8)")
EOF
