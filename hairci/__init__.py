"""hairci — a TPU-native (JAX/XLA/Pallas/pjit) framework for hair-centric
self-supervised representation learning and image retrieval.

Capability-parity rebuild of the reference `atunnd/Hair-centric-Image-Retrieval`
(PyTorch), re-designed TPU-first:

- compute path: jitted Flax models + pure-jnp batched augmentations + Pallas
  kernels for the retrieval hot ops,
- parallelism: `jax.sharding.Mesh` (`data` axis for batch DP, `model` axis for
  the large margin-softmax classifier heads), XLA-inserted collectives,
- no hand-rolled NCCL/DDP: the reference's `src/util/misc.py` distributed
  utilities map onto sharding annotations.

Subpackage map (mirrors SURVEY.md §7 blueprint):
  data/       manifest (CSV) reader + host-side loader
  aug/        batched on-device augmentation stacks (SimCLR two-view, masking)
  models/     ResNet / ViT / masked ViT / face ViT backbones + heads
  losses/     NT-Xent, SupCon, triplet, DINO, MSN, BYOL, dense, S2R2, ...
  ssl/        method recipes (simclr, sham, mae, simmim, byol, densecl, msn,
              dino, dinov2, supcon, siameseim)
  train/      TrainState, jitted update step, EMA, staged negative mining
  parallel/   mesh conventions + collective helpers
  eval/       feature extraction, kNN, linear probe, retrieval metrics,
              variance analysis, UMAP export
  retrieval/  gallery index (sharded matmul + top-k), encoders, persistence
  ops/        Pallas TPU kernels (fused score+top-k, masking)
  preprocess/ hair-region extraction toolkit (offline, gated on torch/facer)
  serve/      demo + visualizer apps (gated on gradio/fastapi)
  cli/        entry points with the reference CLI surface
  utils/      config, logging, schedules, misc
"""

__version__ = "0.1.0"
