"""sc2bench_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for supervised
compression for split computing, with the capabilities of the reference
`sc2-benchmark` (TMLR 2023) re-designed TPU-first.

Layout (mirrors the reference's layer map, see SURVEY.md §1):
  ops/        entropy models, GDN, rANS coder, quantizers  (TPU compute path)
  models/     splittable backbones, wrappers, detection/segmentation
  parallel/   mesh + sharding helpers (pjit data parallel, eval sharding)
  train/      config-driven distillation/training engine
  transforms/ codec round-trips (JPEG/WebP/BPG/VTM), padding, collation
  utils/      metrics, logging, checkpointing
  datasets/   host-side data pipelines
"""

__version__ = '0.1.0'
