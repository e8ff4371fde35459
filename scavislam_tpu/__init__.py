"""scavislam_tpu — a TPU-native visual SLAM framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of ScaViSLAM
(Strasdat et al., "Double Window Optimisation for Constant Time Visual SLAM",
ICCV 2011; reference C++/CUDA tree mounted at /root/reference).

Architecture (functional core, thin imperative shell):

- ``core``     — SE3/Sim3 Lie groups, camera models, analytic Jacobians (pure jax).
- ``ops``      — device kernels: pyramid+Sobel, block-matching stereo, FAST corners,
                 patch warp + ZMSSD scoring, dense-tracking Hessian reduction,
                 descriptors. XLA first, Pallas for the hot paths.
- ``models``   — the SLAM "model families": dense tracker, sparse frontend,
                 DWO slam graph, Schur-complement BA solver, place recognition.
- ``parallel`` — device meshes, shardings, multi-stream batching (vmap/pjit).
- ``pipeline`` — thread shell: monitors (mailboxes), perf monitor, orchestration.
- ``io``       — dataset grabbers (disk sequences, dumps) + native C++ loader.
- ``utils``    — config system, timing, logging.
- ``apps``     — CLI entry points (stereo_slam, create_dictionary, dump tools).
"""

__version__ = "0.1.0"

import jax as _jax

# The default matmul precision on TPU (and this stack's CPU emulation) is
# bfloat16 multiply — measured 1.6e-2 relative error on a 3x3 f32 product,
# which is fatal for pose/Jacobian chains. Geometry must be exact f32;
# throughput-bound kernels (patch scoring, BoW, dense-tracking J^T J) opt
# into bf16 EXPLICITLY by casting their inputs.
_jax.config.update("jax_default_matmul_precision", "highest")
