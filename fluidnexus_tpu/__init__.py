"""fluidnexus_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of FluidNexus (CVPR 2025): single-video 3D fluid reconstruction,
future prediction, and counterfactual interaction.

The reference pipeline (see /root/reference) is four loosely-coupled CUDA/torch
subprojects communicating through files.  This framework is a single package,
redesigned TPU-first:

- ``ops``       — jittable compute kernels: differentiable tile-based Gaussian
                  rasterizer (replaces the CUDA diff-gaussian-rasterization
                  submodules), fixed-radius neighbor search (replaces
                  torch_cluster.radius/radius_graph), grid-hash KNN (replaces
                  simple-knn), segment reductions (replaces torch_scatter).
- ``sim``       — Position-Based Fluids solver as pure functions over a
                  static-capacity particle-state pytree (lax.scan-able).
- ``splat``     — Gaussian-splatting models (background / dynamics / fluid)
                  and render pipes.
- ``diffusion`` — latent-diffusion novel-view model (Zero123-class) and video
                  DiT refiner (CogVideoX-class) with causal 3D VAE.
- ``data``      — cameras, scene readers, fake-view substitution, conversions.
- ``parallel``  — mesh / sharding helpers (dp, tp, sp over ICI).
- ``pipelines`` — the end-to-end stages as composable CLIs.
"""

__version__ = "0.1.0"
