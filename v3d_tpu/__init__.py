"""v3d_tpu — a TPU-native framework with the capabilities of V3D.

V3D (heheyas/V3D) fine-tunes Stable Video Diffusion so a single object image
yields an 18-frame 360-degree orbit video, which is then lifted to 3D by either
3D Gaussian Splatting or NeuS SDF reconstruction.  The reference is a CUDA /
PyTorch / Lightning codebase; this package is a ground-up JAX / XLA / Pallas
redesign for TPU:

- ``core``      config registry, checkpoint IO, torch->JAX weight conversion
- ``parallel``  jax.sharding mesh construction + named-axis sharding helpers
- ``ops``      Pallas kernels (flash attention, fused norms) + numeric ops
- ``diffusion`` EDM diffusion math: scalings, discretizers, guiders, samplers
- ``models``    VideoUNet, VAE (+temporal decoder), CLIP ViT, conditioner
- ``engines``   train / sample engines (pjit train step, EMA, LR schedules)
- ``data``      cameras, preprocessing, orbit datasets, video IO
- ``gs``        3D Gaussian Splatting: pytree gaussians, rasterizer, trainer
- ``nerf``      NeuS SDF reconstruction: hashgrid, occupancy marching, losses
- ``meshops``   mesh structures, differentiable rasterizer, texture refine
- ``apps``      CLI entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
