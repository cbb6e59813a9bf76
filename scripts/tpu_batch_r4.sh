#!/bin/bash
# Round-4 TPU measurement batch (run AFTER tpu_batch_r3.sh finishes; one
# TPU process at a time). Logs land in /tmp/tpu_batch_r4/.
#
# Contents:
#  1. stage probe of the 75/30 point path (names where 1.94 s/chunk goes)
#  2. encode_batch=2 at 75/30 (cheap potential FPS lever)
#  3. KV-merge FPS sweep (the speed axis of the quality-vs-speed curve;
#     quality axis: scripts/kv_merge_quality.py on CPU)
#  4. square-518^2 stage probe (VERDICT r2 #7 / r3 #4)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_batch_r4
mkdir -p "$OUT"

echo "[batch] waiting for TPU backend..." | tee -a "$OUT/status.log"
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[batch] TPU up after $i attempts" | tee -a "$OUT/status.log"
    break
  fi
  if [ "$i" -eq 200 ]; then
    echo "[batch] TPU never came back; giving up" | tee -a "$OUT/status.log"
    exit 1
  fi
  sleep 180
done

run() {
  name=$1; shift
  echo "[batch] START $name: $* ($(date -u +%H:%M))" | tee -a "$OUT/status.log"
  timeout 3600 "$@" > "$OUT/$name.log" 2>&1
  echo "[batch] DONE $name (rc=$?, $(date -u +%H:%M))" | tee -a "$OUT/status.log"
}

run stage_point_75_30 python scripts/stage_probe_point.py point 75 30 0.3 1
run bench_point_eb2 env BENCH_MODEL=point BENCH_WIDTH=75 BENCH_OVERLAP=30 \
    BENCH_CHUNKS=6 BENCH_ENCODE_BATCH=2 python bench.py
for ms in "2,5" "2,10" "4,5" "4,10" "8,10"; do
  tag=$(echo "$ms" | tr , _)
  run bench_point_merge_$tag env VITSLAM_TOKEN_MERGE=$ms BENCH_MODEL=point \
      BENCH_WIDTH=75 BENCH_OVERLAP=30 BENCH_CHUNKS=6 python bench.py
done
run stage_square python scripts/stage_probe.py 4
echo "[batch] ALL DONE" | tee -a "$OUT/status.log"
