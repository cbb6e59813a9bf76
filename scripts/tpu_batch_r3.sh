#!/bin/bash
# Round-3 TPU measurement batch: waits for the axon tunnel to recover,
# then runs the softmax-shift probes and the full bench set sequentially
# (one TPU process at a time). Logs land in /tmp/tpu_batch_r3/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_batch_r3
mkdir -p "$OUT"

echo "[batch] waiting for TPU backend..." | tee "$OUT/status.log"
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
  echo "[batch] START $name: $*" | tee -a "$OUT/status.log"
  timeout 3600 "$@" > "$OUT/$name.log" 2>&1
  echo "[batch] DONE $name (rc=$?)" | tee -a "$OUT/status.log"
}

# 1) softmax-shift A/B in the aggregator, square stress shape then the
#    reference's wide shape
run probe_square python scripts/softmax_sub_probe.py 4
run probe_wide python scripts/softmax_sub_probe.py 4 --aspect 0.3

# 2) headline + square + large-chunk variants (auto shift mode = default)
run bench_feature python bench.py
run bench_square env BENCH_ASPECT=1.0 python bench.py
run bench_point env BENCH_MODEL=point python bench.py
run bench_pose env BENCH_MODEL=pose python bench.py
run bench_pose_only env BENCH_MODEL=pose_only python bench.py

echo "[batch] ALL DONE" | tee -a "$OUT/status.log"
