"""GGRt-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for pose-free
generalizable 3D Gaussian splatting, built from scratch with the capabilities
of the reference GGRt implementation (lifuguan/GGRt_official).

Layer map (cf. SURVEY.md §1):
  geometry/  - pure-jnp camera/projection/epipolar/SE(3) math      (ref L2)
  ops/       - Pallas + XLA compute kernels: Gaussian rasterizer,
               SH evaluation/rotation, bilinear sampling, SSIM      (ref L0/L1)
  models/    - flax modules: epipolar encoder, splatting decoder,
               IPO-Net (iterative depth+pose), composite GGRt model (ref L3)
  losses/    - photometric / depth / rgb losses                    (ref §2.5)
  data/      - dataset loaders, shims, view selection              (ref L4)
  training/  - train state, trainers, deferred BP, checkpointing   (ref L5)
  parallel/  - mesh & sharding for multi-chip TPU                  (ref §2.9)
  evaluation/- metrics & eval protocol                             (ref L6)
"""

__version__ = "0.1.0"
