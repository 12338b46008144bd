"""neurips2023_soc_tpu — a TPU-native JAX/XLA/Pallas framework for Referring
Video Object Segmentation with the capabilities of RobertLuo1/NeurIPS2023_SOC.

The compute path is JAX (flax modules, Pallas kernels, pjit/shard_map over a
device mesh); the reference's CUDA MultiScaleDeformableAttention is replaced by
a TPU-first op (`ops.ms_deform_attn`) with an XLA oracle and a Pallas kernel.

Layer map (mirrors SURVEY.md §1):
  ops/        — L0: TPU-native hot ops (deformable attention, exact resizes)
  utils/      — L1: padded-batch utilities, box math, logging
  models/     — L2: backbones, text encoder, fusion, transformer, VOC, heads
  data/       — L3: datasets + collation into fixed-shape device batches
  training/   — L4: pjit trainers, optimizer groups, checkpointing
  cli/        — L5: entry points
  evaluation/ — L6: COCO-protocol mask eval, DAVIS J&F
  config.py   — L7: YAML+CLI config system
"""

__version__ = "0.1.0"
