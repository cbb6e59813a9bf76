"""vitslam_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
large-scale feed-forward visual SLAM.

Re-designed from scratch for TPU hardware with the capabilities of the
reference research codebase (ruppelb/Large-Scale-ViT-SLAM): a chunked
VGGT-style reconstruction transformer with three inter-chunk alignment
strategies (point-aligned IRLS-Umeyama Sim(3), pose-aligned SE(3)
averaging, and a trained feature-level AlignmentHead with rolling memory
tokens), multi-task training, and an ATE/RPE/Chamfer evaluation stack.

Layout
------
- ``geometry``  pure-jnp SE(3)/Sim(3)/quaternion math, pose encodings,
  Umeyama/Horn/LSE/weighted-median solvers, projection utilities.
- ``ops``       Pallas TPU kernels (flash self/cross attention, kNN) with
  XLA fallbacks for CPU tests.
- ``nn``        transformer building blocks (RoPE 1D/2D, pre-norm blocks,
  qk-norm attention, LayerScale, GatedUpdate memory writer).
- ``models``    the VGGT-style backbone (Aggregator, CameraHead, DPTHead,
  TrackHead) and the AlignmentHead.
- ``slam``      chunk scheduler, rolling context state, and the three
  aligned model variants (feature / point / pose).
- ``parallel``  mesh + sharding setup, precision policy.
- ``data``      dataset readers (VKITTI / KITTI-Odometry / Waymo),
  host-side preprocessing, dynamic batching.
- ``train``     losses with warmup scheduling, optax optimizers, the
  jitted data-parallel train step, checkpointing.
- ``eval``      ATE / RPE / ScaleConsistency / Chamfer metrics, JAX
  kNN + ICP.
- ``config``    YAML config system with ``_target_`` instantiation.
- ``viz``       host-side visualization (viser wrapper, plots).
"""

__version__ = "0.1.0"
