#!/bin/bash
# Round-3 TPU measurement batch: waits for the axon tunnel to recover,
# then runs the decision-critical measurements FIRST (softmax-shift A/B at
# the square stress shape, headline bench, square bench), then the rest.
# One TPU process at a time; logs land in /tmp/tpu_batch_r3/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_batch_r3
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

# decision-critical first
run probe_square python scripts/softmax_sub_probe.py 4
# full suite in one run (feature 5/1, point 75/30, pose 75/30, square
# stress) — bench.py with no env overrides runs all scenarios and emits a
# combined JSON line with "all_metrics" (VERDICT r3 #2).
echo "[batch] START suite ($(date -u +%H:%M))" | tee -a "$OUT/status.log"
timeout 10800 python bench.py > "$OUT/suite.json" 2> "$OUT/suite.log"
echo "[batch] DONE suite (rc=$?, $(date -u +%H:%M))" | tee -a "$OUT/status.log"
# nice-to-have tail
run probe_wide python scripts/softmax_sub_probe.py 4 --aspect 0.3
run bench_pose_only env BENCH_MODEL=pose_only python bench.py

echo "[batch] ALL DONE" | tee -a "$OUT/status.log"
