#!/bin/bash
# Round-5 TPU measurement batch: fire the TNS lever on chip (VERDICT r4
# Next #3/#4). One TPU process at a time; logs land in /tmp/tpu_batch_r5/.
#
# Contents (baselines = BENCH_r04.json: feature 58.9, point 23.2,
# pose 24.1, square 14.1):
#  1. flat-TNS at the exact 75/30 point path   (streaming kernel, 30.9k tok)
#  2. flat-TNS at the exact 75/30 pose path
#  3. fused-TNS at the reference feature 5/1 setting (whole-K kernel)
#  4. square-518^2 with fused-TNS, flat-TNS, and both
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_batch_r5
mkdir -p "$OUT"

echo "[batch] waiting for TPU backend..." | tee -a "$OUT/status.log"
for i in $(seq 1 100); do
  if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[batch] TPU up after $i attempts" | tee -a "$OUT/status.log"
    break
  fi
  if [ "$i" -eq 100 ]; then
    echo "[batch] TPU never came back; giving up" | tee -a "$OUT/status.log"
    exit 1
  fi
  sleep 120
done

run() {
  name=$1; shift
  if [ -f "$OUT/$name.log" ] && grep -q '"metric"' "$OUT/$name.log"; then
    echo "[batch] SKIP $name (already done)" | tee -a "$OUT/status.log"
    return
  fi
  echo "[batch] START $name: $* ($(date -u +%H:%M))" | tee -a "$OUT/status.log"
  timeout 3600 "$@" > "$OUT/$name.log" 2>&1
  echo "[batch] DONE $name (rc=$?, $(date -u +%H:%M))" | tee -a "$OUT/status.log"
  grep '"metric"' "$OUT/$name.log" | tail -1 | tee -a "$OUT/status.log"
}

run point_flat_tns env VITSLAM_FLAT_TNS=1 BENCH_MODEL=point \
    BENCH_WIDTH=75 BENCH_OVERLAP=30 BENCH_CHUNKS=8 python bench.py
run pose_flat_tns env VITSLAM_FLAT_TNS=1 BENCH_MODEL=pose \
    BENCH_WIDTH=75 BENCH_OVERLAP=30 BENCH_CHUNKS=8 python bench.py
run feature_fused_tns env VITSLAM_FUSED_TNS=1 BENCH_MODEL=feature \
    python bench.py
run square_fused_tns env VITSLAM_FUSED_TNS=1 BENCH_MODEL=feature \
    BENCH_ASPECT=1.0 BENCH_CHUNKS=16 python bench.py
run square_flat_tns env VITSLAM_FLAT_TNS=1 BENCH_MODEL=feature \
    BENCH_ASPECT=1.0 BENCH_CHUNKS=16 python bench.py
run square_both_tns env VITSLAM_FUSED_TNS=1 VITSLAM_FLAT_TNS=1 \
    BENCH_MODEL=feature BENCH_ASPECT=1.0 BENCH_CHUNKS=16 python bench.py
echo "[batch] ALL DONE" | tee -a "$OUT/status.log"
