"""Multi-chip (virtual 8-device CPU mesh) sharding tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mocha_sigasia2023_tpu.parallel import make_mesh, replicate, shard_batch


class TestMesh:
    def test_mesh_shape(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        assert mesh.shape["model"] == 1
        mesh42 = make_mesh(n_data=4, n_model=2)
        assert mesh42.shape == {"data": 4, "model": 2}

    def test_batch_actually_sharded(self):
        mesh = make_mesh()
        batch = {"X": np.zeros((16, 60, 25, 15), np.float32)}
        placed = shard_batch(mesh, batch)
        shards = placed["X"].addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape == (2, 60, 25, 15)

    def test_params_replicated(self):
        mesh = make_mesh()
        tree = {"w": np.ones((4, 4), np.float32)}
        placed = replicate(mesh, tree)
        for shard in placed["w"].addressable_shards:
            assert shard.data.shape == (4, 4)

    def test_psum_over_data_axis(self):
        """XLA collectives ride the mesh: a shard_map psum over 'data'
        reduces contributions from all 8 devices."""
        from jax.experimental.shard_map import shard_map

        mesh = make_mesh()
        x = jnp.arange(8.0)

        def f(x):
            return jax.lax.psum(x, "data")

        out = shard_map(f, mesh=mesh, in_specs=P("data"),
                        out_specs=P("data"))(x)
        np.testing.assert_allclose(np.asarray(out), np.full(8, 28.0))


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 60, 24, 15)

    def test_dryrun_multichip(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
