"""Shared test fixtures: synthetic mocha-skeleton motion data.

The generator moved into the package (bench.py --e2e and demo mode need
synthetic clips too); tests import through this shim for stability.
"""

from mocha_sigasia2023_tpu.data.synthetic import (  # noqa: F401
    MOCHA_JOINTS,
    MOCHA_PARENTS,
    make_mocha_bvh_data,
)
