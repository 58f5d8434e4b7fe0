"""neuradar_tpu: a TPU-native neural rendering framework for autonomous driving.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NeuRadar
(mrafidashti/neuradar, CVPR 2025): joint camera + lidar + radar neural feature
fields for AD scenes, with nerfstudio-style configs, pipelines and CLI.

Design stance (TPU-first):
  * every hot path is a single jitted function over dense [rays, samples]
    arrays (no ragged/packed tensors),
  * multiresolution hash grids are gather+interpolate ops (with a Pallas
    fast path), fused MLPs are XLA dot chains sized for the MXU,
  * volume rendering weights are vectorized scans over the samples axis
    (replacing nerfacc CUDA kernels),
  * data parallelism is jax.sharding over a device Mesh (replacing DDP/NCCL).
"""

__version__ = "0.1.0"
