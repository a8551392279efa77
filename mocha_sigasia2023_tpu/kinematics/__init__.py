"""Unified differentiable kinematics library (JAX).

One jit-able, vmap-able, differentiable implementation serving preprocessing,
training losses, and the streaming runtime.  The reference maintains two
parallel copies of this math — NumPy (`/root/reference/motion/quat.py`,
`motion/xform.py`) for preprocessing/runtime and Torch (`motion/tquat.py`,
`motion/txform.py`) for differentiable losses; here they collapse into a
single JAX module set.

Conventions (matching the reference so features/checkpoints interoperate):
  * quaternions are (w, x, y, z), stored in the last axis of size 4
  * joints live on axis -2; all functions broadcast over arbitrary
    leading batch/time axes
  * `parents` is a static Python/NumPy int sequence; -1 marks the root
"""

from . import quat, xform, inertial
from .quat import fk, ik, fk_vel
