"""Trainer — the composition root replacing the reference's Lightning
LitModel + Trainer (training/run_model.py:116-490): per-step dynamically
batched data, random chunk width/overlap sampling, the jitted DP train
step, warmup-cosine AdamW with wildcard freezing, periodic validation with
the Metrics orchestrator, checkpoint/resume with the `_latest` link, CSV
logging, rank-offset seeding.

TPU-specific: random (width, overlap, img_per_seq) combinations each imply
a fresh XLA compile; ``shape_buckets`` (optional) restricts sampling to a
small fixed set of combinations so the step function compiles a handful of
times and then runs hot. With buckets unset, sampling matches the reference
exactly (run_model.py:306-316) at the cost of more compiles.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dynamic import DynamicDataset
from ..io.checkpoint import CheckpointManager, load_checkpoint
from ..io.orbax_ckpt import ShardedCheckpointManager
from ..parallel import make_mesh, shard_batch
from ..slam import ChunkedPipeline, chunk_batch, generate_chunks, merge_chunk_outputs
from .logging_utils import CSVLogger, StepProgress
from .losses import MultitaskLoss
from .optim import build_optimizer, partition_params
from .train_step import TrainState, make_train_step


def sample_chunk_shapes(rng: np.random.Generator, S: int,
                        chunk_width_range, overlap_range,
                        buckets=None) -> tuple[int, int]:
    """Random (chunk_width, overlap) honoring the reference's validity rules
    (run_model.py:306-316): at least one full chunk must fit, overlap <
    width. With ``buckets``, pick the first valid bucket entry instead."""
    if buckets:
        valid = [(w, o) for (w, o) in buckets if S / w > 1 and o < w]
        if valid:
            w, o = valid[int(rng.integers(0, len(valid)))]
            return int(w), int(o)
    rev_w = np.arange(chunk_width_range[1], chunk_width_range[0] - 1, -1)
    valid_w = (S / rev_w) > 1
    max_w = int(rev_w[int(np.argmax(valid_w))])
    w = int(rng.integers(chunk_width_range[0], max_w + 1))
    rev_o = np.arange(overlap_range[1], overlap_range[0] - 1, -1)
    valid_o = rev_o < w
    max_o = int(rev_o[int(np.argmax(valid_o))])
    o = int(rng.integers(overlap_range[0], max_o + 1))
    return w, o


class Trainer:
    def __init__(self, cfg, model, loss: MultitaskLoss,
                 train_data: Optional[DynamicDataset] = None,
                 val_data: Optional[DynamicDataset] = None,
                 metrics=None, params=None, freeze_patterns=None,
                 shape_buckets=None):
        self.cfg = cfg
        self.model = model
        self.loss = loss
        self.train_data = train_data
        self.val_data = val_data
        self.metrics = metrics
        self.shape_buckets = shape_buckets

        self.max_steps = int(cfg.get("max_steps", 1000))
        self.sample_mode = cfg.get("sample_mode", "chunk_overlap")
        self.gt_alignment_type = cfg.get("gt_alignment_type", "scale_from_depths")
        cw = cfg.get("chunk_width", [3, 20])
        ov = cfg.get("num_overlap", [1, 5])
        self.chunk_width_range = cw if isinstance(cw, (list, tuple)) else [cw, cw]
        self.overlap_range = ov if isinstance(ov, (list, tuple)) else [ov, ov]
        self.val_freq = int(cfg.get("val_epoch_freq", 250))
        self.accum_steps = int(cfg.get("accum_steps", 1))
        self.exp_name = cfg.get("exp_name", "experiment")

        self.loss.setup_scheduling(self.max_steps)
        optim_cfg = cfg.get("optim", {})
        lr_opts = optim_cfg.get("options", {}).get("lr", {})
        self.tx, self.schedule = build_optimizer(
            max_lr=float(lr_opts.get("max_value", 5e-5)),
            min_lr=float(lr_opts.get("min_value", 1e-8)),
            total_steps=self.max_steps,
            warmup_percent=float(lr_opts.get("linear_steps", 0.05)),
            weight_decay=float(
                optim_cfg.get("optimizer", {}).get("weight_decay", 0.05)
            ),
            grad_clip_norm=float(
                optim_cfg.get("gradient_clip", {}).get("max_norm", 1.0)
            ),
            accum_steps=self.accum_steps,
        )
        self.freeze_patterns = list(
            freeze_patterns
            if freeze_patterns is not None
            else optim_cfg.get("frozen_module_names", [])
        )

        log_cfg = cfg.get("logging", {})
        self.logger = CSVLogger(log_cfg.get("log_dir", "logs"), self.exp_name)
        self.log_freq = int(log_cfg.get("log_freq", 10))
        ckpt_cfg = cfg.get("checkpoint", {})
        # backend "orbax" = sharded multi-host writes (io/orbax_ckpt.py):
        # every process writes its addressable shards; "msgpack" (default)
        # gathers to host 0 — fine single-host, same resume semantics.
        self._ckpt_backend = str(ckpt_cfg.get("backend", "msgpack"))
        mgr_cls = (ShardedCheckpointManager if self._ckpt_backend == "orbax"
                   else CheckpointManager)
        self.ckpt = mgr_cls(
            ckpt_cfg.get("save_dir", "ckpt"), self.exp_name,
            save_freq=int(ckpt_cfg.get("save_freq", 500)),
        )
        self.resume = bool(ckpt_cfg.get("resume_from_checkpoint", False))

        # num_model_shards > 1 = tensor parallelism: param tensors shard
        # their out dim over the 'model' mesh axis (parallel/mesh.py::
        # shard_params_model; docs/POD_TRAINING.md) — for backbones too
        # big for one chip's HBM. num_devices counts TOTAL local devices.
        n_dev = int(cfg.get("num_devices", 0)) or None
        self.n_model = int(cfg.get("num_model_shards", 1))
        self.mesh = make_mesh(
            n_data=(n_dev // self.n_model if n_dev else None),
            n_model=self.n_model,
        )
        self.seed = int(cfg.get("seed_value", 42))
        # rank-offset seeding (run_model.py:475-476)
        self.rng_np = np.random.default_rng(
            (self.seed + jax.process_index()) * self.max_steps
        )
        self.rng = jax.random.PRNGKey(self.seed + jax.process_index())

        self.params = params
        self.state: Optional[TrainState] = None
        self._step_cache: dict = {}

    # --- state -----------------------------------------------------------
    def init_state(self, sample_batch: dict):
        if self.params is None:
            images = jnp.asarray(sample_batch["images"][:, : self.chunk_width_range[0]])
            self.rng, init_rng = jax.random.split(self.rng)
            self.params = jax.jit(self.model.init, static_argnums=(2,))(
                init_rng, images, self.overlap_range[0]
            )
        trainable, frozen = partition_params(
            self.params["params"], self.freeze_patterns
        )
        self.state = TrainState(
            trainable=trainable, frozen=frozen,
            opt_state=self.tx.init(trainable), step=jnp.asarray(0),
        )
        if self.n_model > 1:
            from ..parallel import shard_params_model

            self.state = shard_params_model(self.state, self.mesh)
        if self.resume:
            path = self.ckpt.resume_path()
            if path:
                if self._ckpt_backend == "orbax":
                    self.state = self.ckpt.restore(self.state)
                else:
                    self.state = load_checkpoint(path, self.state)
                print(f"resumed from {path} at step {int(self.state.step)}")
        return self.state

    def _get_step_fn(self, num_overlap: int):
        key = num_overlap
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                self.model, self.loss, self.tx, num_overlap,
                gt_alignment_type=self.gt_alignment_type,
                use_gt_poses=self.sample_mode in ("chunk_gt", "two_chunks"),
                donate=True,
            )
        return self._step_cache[key]

    @staticmethod
    def normalize_batch(batch: dict) -> dict:
        """First-frame-centric GT normalization before the forward pass
        (the reference's on_before_batch_transfer hook,
        run_model.py:159-179; scale_by_points=False)."""
        from ..slam import normalize_extrinsics_and_points

        if "extrinsics" not in batch:
            return batch
        out = dict(batch)
        e, cam, world, depths = normalize_extrinsics_and_points(
            jnp.asarray(batch["extrinsics"]),
            cam_points=jnp.asarray(batch["cam_points"])
            if "cam_points" in batch else None,
            world_points=jnp.asarray(batch["world_points"])
            if "world_points" in batch else None,
            depths=jnp.asarray(batch["depths"])
            if "depths" in batch else None,
            point_masks=jnp.asarray(batch["point_masks"])
            if "point_masks" in batch else None,
            scale_by_points=False,
        )
        out["extrinsics"] = np.asarray(e)
        if world is not None:
            out["world_points"] = np.asarray(world)
        return out

    def _prepare_chunks(self, batch: dict, width: int, overlap: int):
        batch = self.normalize_batch(batch)
        S = batch["images"].shape[1]
        indices = generate_chunks(S, self.sample_mode, width, overlap,
                                  rng=None)
        chunks_np = chunk_batch(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
            indices,
        )
        merged_np = merge_chunk_outputs(chunks_np, 0)
        # shard over 'data' only when the batch divides the mesh; otherwise
        # replicate (dynamic batching can produce odd batch sizes)
        B = batch["images"].shape[0]
        n_data = self.mesh.shape["data"]
        if B % n_data == 0:
            put = lambda d: shard_batch(d, self.mesh)
        else:
            put = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
        chunks = tuple(put({k: jnp.asarray(v) for k, v in c.items()})
                       for c in chunks_np)
        merged = put({k: jnp.asarray(v) for k, v in merged_np.items()})
        return chunks, merged

    # --- loops -------------------------------------------------------------
    def fit(self):
        assert self.train_data is not None, "fit() needs train_data"
        progress = StepProgress(self.max_steps, self.log_freq)
        start_step = 0
        loader_rng_epoch = 0
        if self.state is None:
            first = next(self.train_data.get_loader(epoch=0))
            self.init_state(first)
            start_step = int(self.state.step)
        for step in range(start_step, self.max_steps):
            batch = next(self.train_data.get_loader(epoch=step))
            S = batch["images"].shape[1]
            width, overlap = sample_chunk_shapes(
                self.rng_np, S, self.chunk_width_range, self.overlap_range,
                self.shape_buckets,
            )
            chunks, merged = self._prepare_chunks(batch, width, overlap)
            self.rng, step_rng = jax.random.split(self.rng)
            step_fn = self._get_step_fn(overlap)
            self.state, metrics = step_fn(self.state, chunks, merged, step_rng)
            if step % self.log_freq == 0 and jax.process_index() == 0:
                host = {k: float(v) for k, v in metrics.items()}
                host["train/chunk_width"] = width
                host["train/chunk_overlap"] = overlap
                host["train/lr"] = float(self.schedule(step))
                self.logger.log_metrics(host, step)
                progress.update(step, host)
            if (step + 1) % self.val_freq == 0:
                self.validate(step)
            self.ckpt.maybe_save(step + 1, self.state)
        self.ckpt.finish()
        return self.state

    def current_params(self):
        from .optim import merge_params

        return {"params": merge_params(self.state.trainable, self.state.frozen)}

    def validate(self, step: int = 0):
        if self.val_data is None or self.metrics is None:
            return {}
        pipeline = ChunkedPipeline(self.model, self.current_params())
        if self.metrics.log_dir is None:
            self.metrics.log_dir = self.logger.log_dir
        batch = next(self.val_data.get_loader(epoch=step))
        batch = self.normalize_batch(batch)
        # validation reuses the training-style chunked forward: random
        # width/overlap sampled per val step from the *metrics* ranges,
        # dedup merge at the sampled overlap, loss at the current step's
        # warmup weights with a per-step RNG (reference run_model.py:255-263,
        # 294-340: val_chunk_width = cfg.metrics.chunk_width and
        # alignAndConvertOutputs(..., overlap=random_overlap) in eval)
        S = batch["images"].shape[1]
        val_rng = np.random.default_rng(self.seed * 100003 + step)
        width, overlap = sample_chunk_shapes(
            val_rng, S, self.metrics.chunk_width_range,
            self.metrics.overlap_range,
        )
        preds, merged = pipeline.run_sequence(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
            sample_mode=self.metrics.full_seq_sample_mode,
            chunk_width=width,
            num_overlap=overlap,
            gt_alignment_type=self.gt_alignment_type,
        )
        val_losses = {"chunk_width": float(width),
                      "chunk_overlap": float(overlap)}
        try:
            ld = self.loss(preds, merged, step,
                           jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                              step))
            val_losses.update({k: float(v) for k, v in ld.items()})
        except Exception as e:  # heads disabled / missing keys
            val_losses["loss_error"] = float("nan")
            print(f"val loss skipped: {e}")
        batch_metrics, seq_metrics = self.metrics(
            preds, merged, pipeline, self.val_data.datasets
        )
        if jax.process_index() == 0:
            self.logger.log_metrics(
                {f"val/{k}": v for k, v in
                 {**val_losses, **batch_metrics, **seq_metrics}.items()},
                step,
            )
        return {**val_losses, **batch_metrics, **seq_metrics}

    def test(self):
        assert self.val_data is not None and self.metrics is not None
        if self.state is None and self.params is not None:
            pipeline = ChunkedPipeline(self.model, self.params)
        else:
            pipeline = ChunkedPipeline(self.model, self.current_params())
        if self.metrics.log_dir is None:
            self.metrics.log_dir = self.logger.log_dir
        seq_metrics = self.metrics.compute_full_sequence_metrics(
            self.val_data.datasets, pipeline,
            rng=np.random.default_rng(self.seed),
        )
        if jax.process_index() == 0:
            self.logger.log_metrics(seq_metrics, 0)
        return seq_metrics
