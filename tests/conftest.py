"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, so this lives at conftest import
time.  Real-TPU execution is exercised by bench.py / the driver, not pytest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the remote-TPU backend and calls
# jax.config.update("jax_platforms", "axon,cpu"), overriding the env var —
# override it back so unit tests run on the local 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_paths():
    """Make the upstream reference importable for golden-value generation.

    Reference modules are used ONLY to produce expected values inside tests
    (they are the spec); the framework itself never imports them.
    """
    for sub in ["", "motion", "etc", "net", "preprocess"]:
        p = os.path.join(REFERENCE_ROOT, sub)
        if p not in sys.path:
            sys.path.insert(0, p)
