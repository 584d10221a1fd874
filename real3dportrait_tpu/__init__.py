"""real3dportrait_tpu — a TPU-native one-shot realistic 3D talking-portrait framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of Real3D-Portrait
(ICLR 2024, arXiv 2401.08503): one source portrait image plus a driving signal
(audio or an expression video) is synthesized into a 512x512 talking-portrait
video.  The compute path is pure JAX (jit/pjit/shard_map + Pallas kernels);
parallelism is expressed over `jax.sharding.Mesh` axes instead of NCCL DDP.

Subpackages
-----------
config     immutable configuration tree + YAML experiment loader
geometry   BFM 3DMM, SECC rasterization, cameras, landmark helpers
ops        XLA/Pallas primitives (upfirdn2d, bias_act, grid_sample, kernels)
rendering  EG3D-style two-pass importance volume renderer (ray-sharded)
models     network modules (img2plane, secc2plane, SR, torso warp, VAE, ...)
parallel   device-mesh / sharding helpers (dp/ray-cp axes)
training   functional trainer, GAN multi-optimizer steps, checkpointing
data       record store, collators, bucketed batching, binarizer schema
inference  end-to-end one-shot synthesis pipeline + CLI
audio      mel / F0 / HuBERT front-end
"""

__version__ = "0.1.0"
