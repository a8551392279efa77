"""Streaming real-time characterization runtime.

The reference demo (test_fullframework.py) ping-pongs every frame between
sklearn BallTree (CPU), the torch decoder (device), and NumPy IK /
inertialization (CPU).  Here the whole per-frame step — context match
(CVAE or nearest-neighbor), decode, root integration, foot-contact
state machine, two-bone IK, blending — is one jitted XLA program with a
carried state pytree, scanned over frames for offline throughput and
vmappable over parallel streams.
"""

from . import export, features, live, matching, stream
