"""Benchmark: flagship FeatureAlignedVGGT chunked-inference throughput on
the real TPU chip.

Measures steady-state frames/sec of the chunk-and-align pipeline at the
reference's inference setting: chunk width 5, overlap 1, img_size 518 at
fix_aspect_ratio 0.3 -> 518x154 frames (every reference test config pins
aspect 0.3 ~= VKITTI's native 375/1242 —
test_featureAlignedVGGT_vkitti.yaml:6,28; README "up to 19 FPS" on a ~12GB
GPU; BASELINE.md). Counts *new* frames per chunk (width - overlap) since
overlapping frames are recomputed by design. BENCH_ASPECT=1.0 benches the
square 518x518 shape instead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

With NO env overrides set, runs the full SUITE (feature 5/1 wide,
point 75/30, pose 75/30, feature square stress) each in a subprocess and
emits one JSON line whose "all_metrics" field carries every scenario —
so the driver artifact records the whole perf state, not one headline
(VERDICT r3 #2). Setting any of BENCH_MODEL / BENCH_ASPECT / BENCH_WIDTH /
BENCH_OVERLAP / BENCH_SMALL pins a single scenario (old behavior).

Env knobs: BENCH_CHUNKS (timed chunks, default 24), BENCH_SMALL=1 (tiny
config smoke mode), BENCH_WIDTH / BENCH_OVERLAP.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# reference README.md:130: feature-aligned 19 FPS (~12GB GPU);
# point/pose-aligned 15 FPS (24GB GPU, chunk 75/overlap 30)
BASELINE_FPS = {"feature": 19.0, "point": 15.0, "pose": 15.0,
                "pose_only": 15.0}


def _probe_backend(timeout_s: int) -> None:
    """Fail fast (exit 2) if the TPU backend cannot initialize.

    The tunneled axon backend HANGS in jax.devices() when the tunnel is
    down (observed round 3), which would wedge the whole bench run; probe
    it in a subprocess with a hard deadline instead."""
    import subprocess

    r = subprocess.run(
        [sys.executable, "-c", "import jax; jax.devices()"],
        capture_output=True, timeout=timeout_s or None,
    )
    if r.returncode != 0:
        sys.stderr.write(
            "bench.py: TPU backend failed to initialize:\n"
            + r.stderr.decode()[-2000:] + "\n")
        sys.exit(2)


# Suite scenarios: (tag, env overrides). Chunk counts trimmed for the
# 75/30 shapes (45 new frames/chunk -> 8 chunks is plenty of steady state)
# and for square_stress (16 chunks; r4's 24-chunk run spent 9 min of chip
# time on a steady-state number — VERDICT r4 Weak #5), paying for the
# train scenario (VERDICT r4 Next #6) so total suite wall stays bounded.
SUITE = [
    ("feature_5_1", {"BENCH_MODEL": "feature"}),
    ("point_75_30", {"BENCH_MODEL": "point", "BENCH_WIDTH": "75",
                     "BENCH_OVERLAP": "30", "BENCH_CHUNKS": "8"}),
    ("pose_75_30", {"BENCH_MODEL": "pose", "BENCH_WIDTH": "75",
                    "BENCH_OVERLAP": "30", "BENCH_CHUNKS": "8"}),
    ("square_stress", {"BENCH_MODEL": "feature", "BENCH_ASPECT": "1.0",
                       "BENCH_CHUNKS": "16"}),
    ("train_w20_o5", {"BENCH_TRAIN": "1"}),
]

# Flagship train step, widest reference bucket (chunk 20 / overlap 5,
# train_featureAlignedVGGT_vkitti.yaml:14-15). The reference publishes no
# train-throughput number (BASELINE.md: "70k steps, >=1 GPU" only), so
# vs_baseline is against OUR round-3 on-chip measurement (0.99 s/step,
# BENCH.md round-3 train table) — a regression guard, not a reference
# comparison.
TRAIN_BASELINE_SEC_PER_STEP = 0.99


def _run_train_scenario() -> None:
    """BENCH_TRAIN=1: time the flagship frozen-backbone train step at the
    w20_o5 bucket via scripts/train_bench.py and print one metric line."""
    import subprocess

    steps = os.environ.get("BENCH_TRAIN_STEPS", "3")
    repo = os.path.dirname(os.path.abspath(__file__))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_bench.py"),
         "--steps", steps, "--buckets", "20:5", "--descent-steps", "0"],
        capture_output=True, text=True, timeout=3600,
    )
    row = None
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                row = json.loads(ln)
            except json.JSONDecodeError:
                pass
    if row is None or "sec_per_step" not in row:
        sys.stderr.write(f"bench.py[train]: train_bench failed "
                         f"(rc={r.returncode}):\n" + r.stderr[-1500:] + "\n")
        sys.exit(1)
    sys.stderr.write(f"# train_bench: {json.dumps(row)}\n")
    print(json.dumps({
        "metric": "feature_aligned_train_sec_per_step_w20_o5_518x154",
        "value": row["sec_per_step"],
        "unit": "sec/step",
        "vs_baseline": round(
            TRAIN_BASELINE_SEC_PER_STEP / row["sec_per_step"], 3),
    }))


def _run_suite() -> None:
    """Run every SUITE scenario in its own subprocess (memory isolation +
    persistent compile cache reuse) and print one combined JSON line."""
    import subprocess

    results = []
    for tag, overrides in SUITE:
        env = dict(os.environ, **overrides)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"bench.py[suite]: scenario {tag} timed out\n")
            results.append({"scenario": tag, "error": "timeout"})
            continue
        line = None
        for ln in r.stdout.decode().splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                try:
                    line = json.loads(ln)
                except json.JSONDecodeError:
                    pass
        if line is None:
            sys.stderr.write(
                f"bench.py[suite]: scenario {tag} failed (rc={r.returncode}):\n"
                + r.stderr.decode()[-1500:] + "\n")
            results.append({"scenario": tag, "error": f"rc={r.returncode}"})
        else:
            line["scenario"] = tag
            line["wall_s"] = round(time.time() - t0, 1)
            results.append(line)
            sys.stderr.write(f"# suite {tag}: {json.dumps(line)}\n")

    ok = [r for r in results if "error" not in r]
    if not ok:
        sys.stderr.write("bench.py[suite]: every scenario failed\n")
        sys.exit(2)
    head = ok[0]  # feature 5/1 headline when it succeeded
    print(json.dumps({
        "metric": head["metric"], "value": head["value"],
        "unit": head["unit"], "vs_baseline": head["vs_baseline"],
        "all_metrics": results,
    }))


def main():
    try:
        _probe_backend(int(os.environ.get("BENCH_PROBE_TIMEOUT", 600)))
    except Exception as e:  # subprocess.TimeoutExpired and friends
        sys.stderr.write(f"bench.py: TPU backend probe timed out/failed "
                         f"({e!r}); the axon tunnel is likely down\n")
        sys.exit(2)

    if not any(os.environ.get(k) for k in (
            "BENCH_MODEL", "BENCH_ASPECT", "BENCH_WIDTH", "BENCH_OVERLAP",
            "BENCH_SMALL", "BENCH_TRAIN")):
        _run_suite()
        return

    if os.environ.get("BENCH_TRAIN"):
        _run_train_scenario()
        return

    import jax
    import jax.numpy as jnp

    # Persistent XLA compilation cache — must go through jax.config.update:
    # this machine's sitecustomize imports jax at interpreter startup, so
    # jax.config is frozen from the env before any code here runs (env-var
    # setdefault is silently ignored).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from vitslam_tpu.models.presets import flagship
    from vitslam_tpu.slam import ChunkedPipeline

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    variant = os.environ.get("BENCH_MODEL", "feature")
    width = int(os.environ.get("BENCH_WIDTH", 5))
    overlap = int(os.environ.get("BENCH_OVERLAP", 1))
    n_timed = int(os.environ.get("BENCH_CHUNKS", 24))

    aspect = float(os.environ.get("BENCH_ASPECT", 0.3))
    if small:
        from vitslam_tpu.models.presets import small_feature_aligned
        model = small_feature_aligned()
        W = 224
    elif variant == "point":
        from vitslam_tpu.models.presets import flagship_point_aligned
        model = flagship_point_aligned()
        W = 518
    elif variant == "pose":
        from vitslam_tpu.models.presets import flagship_pose_aligned
        model = flagship_pose_aligned()
        W = 518
    elif variant == "pose_only":
        from vitslam_tpu.models.presets import flagship_pose_only
        model = flagship_pose_only()
        W = 518
    else:
        model = flagship()
        W = 518
    from vitslam_tpu.data.preprocess import get_target_shape
    H = int(get_target_shape(aspect, W, 14)[0])

    # default encode batch: 16 at the wide reference aspect; the square
    # stress shape has ~3.3x the tokens per frame and OOMs HBM beyond 8.
    # Scale down with chunk width (the 75/30 variants' tap tensors are
    # width-proportional: 16 chunks x 75 frames OOMs 16 GB)
    default_eb = max(1, (16 if H <= 300 else 8) * 5 // width)
    encode_batch = int(os.environ.get("BENCH_ENCODE_BATCH", default_eb))
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (1, width, 3, H, W), jnp.bfloat16)
    group_images = jax.random.uniform(
        rng, (encode_batch, width, 3, H, W), jnp.bfloat16
    )

    pipe = ChunkedPipeline(model, encode_batch=encode_batch)
    t0 = time.time()
    pipe.init_params(rng, images, overlap)
    init_s = time.time() - t0

    # Force a host readback of a small reduction to delimit each step: on
    # the tunneled axon backend block_until_ready does not actually block,
    # so a device->host transfer is the only honest fence.
    def fence(outputs):
        key = "pose_enc" if "pose_enc" in outputs else sorted(outputs)[0]
        return float(jnp.sum(outputs[key].astype(jnp.float32).ravel()[:64]))

    pipelined = encode_batch > 1 and hasattr(model, "encode_chunks")
    shape = tuple(images.shape)

    def run_group(state):
        """Encode `encode_batch` chunks at once, then align sequentially —
        the pipelined inference path (ChunkedPipeline with encode_batch)."""
        raw = pipe._encode_fn(pipe.params, group_images)
        outputs = None
        for k in range(encode_batch):
            raw_k = jax.tree_util.tree_map(
                lambda x: x[k: k + 1], raw
            )
            outputs, state = pipe._align_fn(
                pipe.params, raw_k, shape, overlap, state, None, False, None
            )
        return outputs, state

    # compile warmup (first-chunk + continuation traces)
    t0 = time.time()
    if pipelined:
        outputs, state = pipe._align_fn(
            pipe.params,
            jax.tree_util.tree_map(lambda x: x[:1],
                                   pipe._encode_fn(pipe.params, group_images)),
            shape, overlap, None, None, False, None,
        )
        fence(outputs)
        outputs, state = run_group(state)
        fence(outputs)
    else:
        outputs, state = pipe.step(images, overlap, None)
        fence(outputs)
        outputs, state = pipe.step(images, overlap, state)
        fence(outputs)
        outputs, state = pipe.step(images, overlap, state)
        fence(outputs)
    compile_s = time.time() - t0

    # steady state: sequential chunk stream (state carried on device)
    t0 = time.time()
    if pipelined:
        n_groups = max(1, n_timed // encode_batch)
        for _ in range(n_groups):
            outputs, state = run_group(state)
            fence(outputs)
        n_timed = n_groups * encode_batch
    else:
        for _ in range(n_timed):
            outputs, state = pipe.step(images, overlap, state)
            fence(outputs)
    elapsed = time.time() - t0

    new_frames = n_timed * (width - overlap)
    fps = new_frames / elapsed
    chunks_per_sec = n_timed / elapsed

    result = {
        "metric": "%s_aligned_inference_fps_chunk%d_ovl%d_%dx%d" % (variant, width, overlap, W, H),
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS.get(variant, 19.0), 3),
    }
    print(json.dumps(result))
    print(
        f"# device={jax.devices()[0].device_kind} chunks/s={chunks_per_sec:.3f} "
        f"init={init_s:.1f}s compile={compile_s:.1f}s timed_chunks={n_timed}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
