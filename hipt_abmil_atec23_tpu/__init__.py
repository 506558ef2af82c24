"""hipt_abmil_atec23_tpu — a TPU-native (JAX/XLA/Pallas) whole-slide-image MIL framework.

A ground-up rebuild of the capability surface of scjjb/HIPT_ABMIL_ATEC23
(CLAM/HIPT lineage): WSI tiling -> hierarchical ViT encoding -> attention-based
multiple-instance-learning -> k-fold cross-validated training/eval -> attention
heatmaps. Designed TPU-first:

- bags are batched, padded and masked ([B, N, D] + mask) instead of the
  reference's one-slide-per-step Python loop (reference: utils/core_utils.py:300-442);
- the HIPT_4K two-GPU pipeline with host bounces (reference: HIPT_4K/hipt_4k.py:48-76)
  is a single fused XLA graph with all 256 sub-tiles as a batch dimension;
- cross-validation folds, bags, and encoder batches shard over a
  jax.sharding.Mesh via shard_map/pjit with XLA collectives over ICI;
- hot ops (gated-attention MIL pooling, ViT flash attention) have Pallas TPU
  kernels with jnp reference fallbacks.

Subpackages:
  ops       — numerical kernels (masked attention pooling, flash attention, image ops)
  models    — Flax modules: ABMIL/CLAM heads, ViT-256/ViT-4K, HIPT_4K, ResNet
  data      — manifests, splits, feature-bag stores, host prefetch pipeline
  engine    — train/eval/tune loops, metrics, checkpointing, bootstrapping
  parallel  — mesh construction and sharding helpers
  slideio   — pyramidal slide reading (native C++ TIFF reader), segmentation, patching
  explain   — attention heatmaps and visual reports
  utils     — config tree, registries, logging, seeding
"""

__version__ = "0.1.0"
