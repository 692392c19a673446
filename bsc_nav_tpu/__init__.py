"""bsc_nav_tpu — a TPU-native spatial-cognition navigation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of BSC-Nav
(reference: Heathcliff-saku/BSC-Nav): training-free embodied navigation
driven by a structured 3D spatial memory (a working memory of ViT patch
tokens scattered into an allocentric voxel grid plus a long-term memory of
detected object instances), queried by text / image / instruction goals.

Layering (mirrors SURVEY.md §1, redesigned TPU-first):
  - geometry.py          vectorized pinhole/SE(3)/voxel math (jit-safe)
  - memory/              device-resident voxel token store: ingest, query,
                         replacement policies, persistence (reference
                         memory_2.py re-architected as XLA programs)
  - ops/                 Pallas TPU kernels (flash attention, fused
                         similarity top-k, scatter)
  - models/              frozen perception models served in JAX (DINOv2-
                         style ViT, CLIP towers, detector, MMDiT)
  - env/                 host-side environment layer (habitat wrapper +
                         fake env for tests)
  - agents/              navigation agents + LLM cognition layer
  - parallel/            device mesh, sharded store, distributed top-k
  - utils/               profiling, logging
"""

from bsc_nav_tpu.config import Config, small_test_config

__version__ = "0.1.0"
__all__ = ["Config", "small_test_config", "__version__"]
