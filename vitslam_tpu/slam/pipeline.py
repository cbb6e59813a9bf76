"""ChunkedPipeline — the host-side streaming driver around the jitted
per-chunk model step.

Reference parity: the chunk loops at training/run_model.py:294-340 (training
forward: random chunk width/overlap, context threading, GT alignment) and
training/training_metrics.py:616-657 (apply_sequence_to_model: fixed-shape
no_grad streaming with per-chunk CPU offload).

TPU-first design:
  * the per-chunk step is one jit-compiled function of
    (params, images_chunk, state) -> (outputs, state); first-chunk and
    continuation chunks trace separately (different state structure), and
    XLA caches one executable per (S, H, W, overlap) bucket;
  * chunk outputs are asynchronously fetched to host right after dispatch of
    the next chunk (double-buffered compute/transfer overlap — the analog of
    the reference's moveDictListItemToCPU + empty_cache), so HBM usage is
    flat in sequence length;
  * only the fixed-shape recurrent state (overlap/memory tokens, pose tail)
    stays device-resident across chunks.
"""
from __future__ import annotations

import random as pyrandom
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import pad_to_4x4
from .chunking import chunk_batch, generate_chunks, merge_chunk_outputs
from .gt_alignment import align_outputs, per_chunk_scale_from_poses


class ChunkedPipeline:
    """Drives a chunk-aligned model over an arbitrary-length sequence."""

    def __init__(self, model, params=None, train: bool = False,
                 encode_batch: int = 1, mesh=None):
        """encode_batch > 1 enables the two-stage pipelined driver: the
        chunk-independent backbone+decoder stage runs batched over
        ``encode_batch`` chunks at once (stacked along B — ~95% of FLOPs at
        much higher MXU utilization), while the cheap recurrent alignment
        stage runs sequentially. Requires a model exposing
        encode_chunks/align_chunk (FeatureAlignedVGGT). Numerically
        identical to the sequential path.

        mesh: optional jax.sharding.Mesh — the multi-chip SERVING path:
        the stacked chunk batch is sharded over the mesh's first axis
        (chunks are mutually independent, so encode scales near-linearly
        with chips; ~95% of per-chunk time), params are replicated, and
        the cheap sequential alignment stage consumes per-chunk slices.
        encode_batch must be a multiple of the axis size."""
        self.model = model
        self.params = params
        self.train = train
        self.encode_batch = encode_batch
        self.mesh = mesh
        self._step = jax.jit(
            self._apply, static_argnums=(2, 5), donate_argnums=(3,)
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            axis = mesh.axis_names[0]
            assert encode_batch % mesh.shape[axis] == 0, (
                f"encode_batch {encode_batch} must be a multiple of the "
                f"'{axis}' mesh axis size {mesh.shape[axis]}")
            batch_sh = NamedSharding(mesh, Pspec(axis))
            repl = NamedSharding(mesh, Pspec())
            self._encode_fn = jax.jit(
                lambda p, im: self.model.apply(p, im, method="encode_chunks"),
                in_shardings=(repl, batch_sh), out_shardings=batch_sh,
            )
        else:
            self._encode_fn = jax.jit(
                lambda p, im: self.model.apply(p, im, method="encode_chunks")
            )
        self._embed_fn = (
            jax.jit(lambda p, im: self.model.apply(p, im,
                                                   method="embed_frames"))
            if hasattr(model, "embed_frames") else None)
        self._encode_tok_fn = jax.jit(
            lambda p, im, tok: self.model.apply(p, im, tok,
                                                method="encode_chunks"))
        self._align_fn = jax.jit(
            lambda p, raw, shape, k, ctx, gt, tr, rng: self.model.apply(
                p, raw, shape, k, ctx, gt, tr, method="align_chunk",
                rngs={"dropout": rng} if (tr and rng is not None) else None,
            ),
            static_argnums=(2, 3, 6),
        )

    # --- model plumbing ---------------------------------------------------
    def _apply(self, params, images, num_overlap, state, gt_pose0, train, rng):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.model.apply(
            params, images, num_overlap, state, gt_pose0, train, rngs=rngs
        )

    def init_params(self, rng: jax.Array, sample_images: jax.Array,
                    num_overlap: int = 1):
        """Initialize parameters by tracing the first-chunk path (which
        creates the superset of parameters, incl. the memory hybrid-init).
        Jitted: un-jitted flax init dispatches one device op per parameter,
        which is pathological over remote-tunnel backends."""
        params = jax.jit(self.model.init, static_argnums=(2,))(
            rng, sample_images, num_overlap
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            repl = NamedSharding(self.mesh, Pspec())
            params = jax.device_put(params, repl)
        self.params = params
        return params

    def step(self, images, num_overlap: int, state=None, gt_pose0=None,
             rng: Optional[jax.Array] = None):
        """One jitted chunk step. images (B, S, 3, H, W)."""
        return self._step(
            self.params, images, num_overlap, state, gt_pose0, self.train, rng
        )

    # --- sequence driver ----------------------------------------------------
    def run_sequence(
        self,
        batch: dict,
        sample_mode: str = "chunk_overlap",
        chunk_width: int = 5,
        num_overlap: int = 1,
        gt_alignment_type: str = "none",
        seq_width: int = -1,
        rng: Optional[jax.Array] = None,
        keep_images: bool = False,
        merge_overlap: Optional[int] = None,
        py_rng: Optional[pyrandom.Random] = None,
    ) -> tuple[dict, dict]:
        """Run the chunk-and-align loop over a full batch.

        Args:
            batch: dict with 'images' (B, N, 3, H, W) and optional GT keys
                ('extrinsics', 'depths', 'point_masks', 'world_points', ...).
            sample_mode: chunk_gt | chunk_overlap | all | two_chunks.
            chunk_width / num_overlap: chunking parameters (static shapes).
            gt_alignment_type: GT alignment applied after merging.
            merge_overlap: frames deduped at merge; defaults to
                ``num_overlap`` (inference). Training passes 0 so the merged
                outputs/GT keep the duplicated overlap frames
                (run_model.py:338).
        Returns:
            (predictions dict, merged GT batch dict) — merged along frames.
        """
        images = batch["images"]
        N = images.shape[1]
        indices = generate_chunks(N, sample_mode, chunk_width, num_overlap,
                                  rng=py_rng)
        chunks = chunk_batch(batch, indices)
        use_gt = sample_mode in ("chunk_gt", "two_chunks")

        raw_per_chunk = None
        if (self.encode_batch > 1 and not self.train
                and hasattr(self.model, "encode_chunks")):
            raw_per_chunk = self._encode_all(chunks, indices, images)

        state = None
        chunk_outputs: list[dict] = []
        pending = None  # (outputs device pytree, images) for async offload
        for i, chunk in enumerate(chunks):
            gt_poses = None
            if use_gt and "extrinsics" in chunk:
                gt_poses = pad_to_4x4(
                    jnp.asarray(chunk["extrinsics"], jnp.float32)
                )
            step_rng = None
            if self.train and rng is not None:
                rng, step_rng = jax.random.split(rng)
            if raw_per_chunk is not None:
                outputs, state = self._align_fn(
                    self.params, raw_per_chunk[i],
                    tuple(chunk["images"].shape), num_overlap, state,
                    gt_poses, False, None,
                )
            else:
                outputs, state = self.step(
                    jnp.asarray(chunk["images"]), num_overlap, state,
                    gt_poses, step_rng,
                )
            if self.train:
                # keep on device — gradients flow through the whole loop
                chunk_outputs.append(outputs)
            else:
                # async host fetch of the previous chunk while this one runs
                if pending is not None:
                    chunk_outputs.append(self._fetch(pending, keep_images))
                pending = (outputs, chunk["images"] if keep_images else None)
        if pending is not None:
            chunk_outputs.append(self._fetch(pending, keep_images))

        if gt_alignment_type == "per_chunk_scale_from_poses":
            chunk_outputs = per_chunk_scale_from_poses(chunk_outputs, chunks)

        mo = num_overlap if merge_overlap is None else merge_overlap
        if sample_mode in ("chunk_gt", "two_chunks", "all"):
            mo = 0
        predictions = merge_chunk_outputs(chunk_outputs, mo)
        merged_batch = merge_chunk_outputs(chunks, mo)
        predictions = align_outputs(
            predictions, merged_batch, gt_alignment_type, seq_width,
            image_size_hw=tuple(images.shape[-2:]),
        )
        return predictions, merged_batch

    def _encode_all(self, chunks: list[dict], indices=None,
                    seq_images=None) -> list:
        """Stage 1 of the pipelined driver: batch same-shape chunks along B
        (up to ``encode_batch`` at a time), run the chunk-independent
        encode, and split the raw outputs back per chunk.

        When the model exposes ``embed_frames`` (and B == 1, no mesh), the
        per-frame patch embedding runs once per UNIQUE frame of the group:
        with overlap o, consecutive chunks share o frames, so ~o/width of
        the embed compute (the 24-block DINOv2 ViT) is deduplicated; the
        gathered tokens feed ``encode_chunks(patch_tokens=...)``, which is
        numerically identical (frame embedding is frame-independent)."""
        raws: list = [None] * len(chunks)
        dedup = (self.mesh is None and indices is not None
                 and seq_images is not None
                 and hasattr(self.model, "embed_frames")
                 and chunks[0]["images"].shape[0] == 1
                 and self._embed_fn is not None)
        i = 0
        while i < len(chunks):
            shape = chunks[i]["images"].shape
            group = [i]
            while (len(group) < self.encode_batch
                   and i + len(group) < len(chunks)
                   and chunks[i + len(group)]["images"].shape == shape):
                group.append(i + len(group))
            imgs = [jnp.asarray(chunks[g]["images"]) for g in group]
            if self.mesh is not None:
                # tail group: pad to a multiple of the mesh axis by
                # repeating the last chunk (its outputs are dropped below)
                n_axis = self.mesh.shape[self.mesh.axis_names[0]]
                imgs += [imgs[-1]] * ((-len(imgs)) % n_axis)
            stacked = jnp.concatenate(imgs, axis=0)

            tokens = None
            if dedup:
                S = shape[1]
                ids = np.concatenate([np.asarray(indices[g]) for g in group])
                uniq, inv = np.unique(ids, return_inverse=True)
                if len(uniq) < len(ids):
                    # pad the unique list to an 8-frame bucket so one
                    # compiled embed shape serves every full group
                    target = -(-len(uniq) // 8) * 8
                    uniq_p = np.concatenate(
                        [uniq, np.full(target - len(uniq), uniq[-1])])
                    frames = jnp.asarray(seq_images)[:, uniq_p]  # (1,F,...)
                    emb = self._embed_fn(self.params, frames)    # (1,F,P,C)
                    tok = jnp.take(emb[0], jnp.asarray(inv), axis=0)
                    tokens = tok.reshape(len(group), S, *tok.shape[1:])

            if tokens is not None:
                raw = self._encode_tok_fn(self.params, stacked, tokens)
            else:
                raw = self._encode_fn(self.params, stacked)
            B = shape[0]
            for k, g in enumerate(group):
                raws[g] = jax.tree_util.tree_map(
                    lambda x: x[k * B:(k + 1) * B], raw
                )
            i += len(group)
        return raws

    @staticmethod
    def _fetch(pending, keep_images: bool) -> dict:
        outputs, imgs = pending
        host = jax.tree_util.tree_map(np.asarray, outputs)
        if keep_images and imgs is not None:
            host["images"] = np.asarray(imgs)
        return host
