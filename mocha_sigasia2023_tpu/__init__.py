"""mocha_sigasia2023_tpu — a TPU-native motion-characterization framework.

A from-scratch JAX / XLA / Pallas / pjit re-design with the capabilities of
MOCHA (SIGGRAPH Asia 2023, "Real-Time Motion Characterization via Context
Matching"): BVH motion I/O, feature-database generation, a unified
differentiable quaternion/transform kinematics library, the body-part-graph
ST-GCN + context-matching transformer generator, the CVAE autoregressive
character-feature predictor, and a streaming real-time characterization
runtime (decode -> root integration -> foot-contact locking -> two-bone IK ->
inertialization), all structured as fused XLA programs that batch across
streams on TPU.

Subpackages
-----------
kinematics  quaternion / 3x3-transform algebra, FK/IK, springs (one JAX
            library serving preprocessing, losses, and the runtime — the
            reference keeps two copies, NumPy + Torch).
io          BVH parser/writer and the bit-compatible ``database.bin`` codec.
data        preprocessing (root-bone synthesis, mirroring, contacts),
            windowed dataset construction, normalization stats.
models      Generator (ST-GCN + transformer), CVAE, Projector.
train       losses, trainers, EMA, checkpointing.
runtime     context matching + streaming characterization loop.
parallel    device-mesh / sharding helpers.
ops         Pallas TPU kernels for the hot paths.
"""

__version__ = "0.1.0"
