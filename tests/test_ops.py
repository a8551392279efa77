"""Pallas kernel correctness (interpret mode on CPU) + native codec tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mocha_sigasia2023_tpu.ops.attention import (
    fused_attention, set_fused_attention,
)
from mocha_sigasia2023_tpu.io import native


class TestFusedAttention:
    @pytest.mark.parametrize("shape", [(2, 4, 90, 128), (1, 4, 90, 256),
                                       (2, 2, 90, 64)])
    def test_matches_xla_reference(self, shape):
        b, h, n, d = shape
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, shape)
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, n, d))
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, n, d))
        scale = d ** -0.5

        ref = jnp.einsum(
            "bhnm,bhmd->bhnd",
            jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, -1),
            v)
        out = fused_attention(q, k, v, scale=scale, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_cross_attention_shapes(self):
        q = jnp.ones((1, 2, 90, 64))
        k = jnp.ones((1, 2, 45, 64))
        v = jnp.ones((1, 2, 45, 64))
        out = fused_attention(q, k, v, scale=0.125, interpret=True)
        assert out.shape == (1, 2, 90, 64)

    def test_layer_dispatch_flag(self):
        from mocha_sigasia2023_tpu.ops.attention import fused_attention_enabled

        set_fused_attention(True)
        assert fused_attention_enabled()
        set_fused_attention(False)
        assert not fused_attention_enabled()


class TestNativeCodec:
    def test_parse_floats_matches_numpy(self):
        text = "1.5 -2.25e3 0.001\n4 -0.0 1e-8\t7"
        ref = np.array(text.split(), dtype=np.float64)
        np.testing.assert_array_equal(native.parse_floats(text), ref)

    def test_format_frames_printf_compatible(self):
        vals = np.array([[1.5, -2.0], [0.125, 3.0]])
        s = native.format_frames(vals)
        assert s == "1.500000 -2.000000 \n0.125000 3.000000 \n"

    def test_roundtrip_large(self):
        rng = np.random.RandomState(0)
        vals = rng.randn(200, 72)
        s = native.format_frames(vals)
        back = native.parse_floats(s).reshape(200, 72)
        np.testing.assert_allclose(back, vals, atol=1e-6)


class TestFusedDispatch:
    def test_generator_forward_same_with_fused_attention(self):
        """Flipping the fused-attention flag must not change generator
        output (interpret-mode Pallas on CPU)."""
        import torch
        from conftest import add_reference_paths, reference_available
        if not reference_available():
            pytest.skip("reference unavailable")
        add_reference_paths()
        from test_models import MODEL_CFG
        from mocha_sigasia2023_tpu.models import GeneratorConfig
        from mocha_sigasia2023_tpu.models import generator as gen
        from mocha_sigasia2023_tpu.models.generator import init_generator
        from mocha_sigasia2023_tpu.ops import attention as ops_attn

        cfg = GeneratorConfig.from_dict(MODEL_CFG)
        params = init_generator(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 60, 24, 15))
        y = jax.random.normal(jax.random.PRNGKey(2), (1, 60, 24, 15))
        base = gen.forward(params, cfg, x, y)
        # interpret-mode kernels on CPU
        orig_call = ops_attn.fused_attention
        try:
            set_fused_attention(True)
            ops_attn.fused_attention = lambda q, k, v, scale: orig_call(
                q, k, v, scale=scale, interpret=True)
            fused = gen.forward(params, cfg, x, y)
        finally:
            set_fused_attention(False)
            ops_attn.fused_attention = orig_call
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   atol=2e-5, rtol=1e-4)


class TestNativeDBReader:
    def test_block_reader_matches_python_codec(self, tmp_path):
        from mocha_sigasia2023_tpu.io.native import read_db_block_f32
        from mocha_sigasia2023_tpu.io.database import save_database
        import numpy as np

        rng = np.random.RandomState(0)
        db = {
            "bone_positions": rng.randn(10, 5, 3).astype(np.float32),
            "bone_velocities": rng.randn(10, 5, 3).astype(np.float32),
            "bone_rotations": rng.randn(10, 5, 4).astype(np.float32),
            "bone_angular_velocities": rng.randn(10, 5, 3).astype(np.float32),
            "bone_parents": np.arange(5, dtype=np.int32) - 1,
            "range_starts": np.array([0], np.int32),
            "range_stops": np.array([10], np.int32),
            "style_labels": np.array([1], np.int32),
            "action_labels": np.array([2], np.int32),
            "contact_states": np.zeros((10, 2), np.uint8),
        }
        path = str(tmp_path / "db.bin")
        save_database(path, db)
        buf = open(path, "rb").read()
        res = read_db_block_f32(buf, 0, 3)
        if res is None:
            pytest.skip("native library unavailable")
        pos, off1 = res
        np.testing.assert_array_equal(pos, db["bone_positions"])
        vel, _ = read_db_block_f32(buf, off1, 3)
        np.testing.assert_array_equal(vel, db["bone_velocities"])
