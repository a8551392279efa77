"""I/O + preprocessing parity tests against the reference implementation."""

import io as _io
import os

import numpy as np
import pytest
import scipy.ndimage as ndimage
import scipy.signal as signal

import jax
import jax.numpy as jnp

from conftest import add_reference_paths, reference_available
from helpers import make_mocha_bvh_data, MOCHA_PARENTS

from mocha_sigasia2023_tpu.io import bvh as jbvh
from mocha_sigasia2023_tpu.io import database as jdb
from mocha_sigasia2023_tpu.data import preprocess as pre
from mocha_sigasia2023_tpu.data import windows as win

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo unavailable", allow_module_level=True)

add_reference_paths()
import bvh as rbvh  # noqa: E402
import quat as rq  # noqa: E402
from generate_database import process_data as ref_process_data  # noqa: E402
from generate_database import animation_mirror as ref_mirror  # noqa: E402
import utils as rutils  # noqa: E402


class TestBVH:
    def test_roundtrip_and_reference_parser_agree(self, tmp_path):
        data = make_mocha_bvh_data(T=30, seed=3)
        path = str(tmp_path / "clip.bvh")
        jbvh.save(path, data, frametime=1.0 / 60.0)

        ours = jbvh.load(path)
        ref = rbvh.load(path)

        assert ours["names"] == ref["names"]
        np.testing.assert_array_equal(ours["parents"], ref["parents"])
        assert ours["order"] == ref["order"]
        np.testing.assert_allclose(ours["offsets"], ref["offsets"], atol=1e-6)
        np.testing.assert_allclose(ours["rotations"], ref["rotations"], atol=1e-6)
        np.testing.assert_allclose(ours["positions"], ref["positions"], atol=1e-6)

        # and the write itself roundtrips our own values to %f precision
        np.testing.assert_allclose(
            ours["positions"][:, 0], data["positions"][:, 0], atol=1e-5
        )

    def test_save_positions_six_channels(self, tmp_path):
        data = make_mocha_bvh_data(T=5, seed=1)
        path = str(tmp_path / "clip6.bvh")
        jbvh.save(path, data, save_positions=True)
        ours = jbvh.load(path)
        ref = rbvh.load(path)
        np.testing.assert_allclose(ours["positions"], ref["positions"], atol=1e-6)
        np.testing.assert_allclose(ours["rotations"], ref["rotations"], atol=1e-6)

    def test_nine_channel_parse_matches_reference(self, tmp_path):
        """The rare 9-channel variant (per-joint position+rotation+scale;
        reference bvh.py:119-123): root row is 3 position values, every
        other joint contributes 9, and scaled joint positions ADD onto the
        hierarchy offsets."""
        header = "\n".join([
            "HIERARCHY",
            "ROOT Hips",
            "{",
            "    OFFSET 0.0 1.0 0.0",
            "    CHANNELS 3 Xposition Yposition Zposition",
            "    JOINT Spine1",
            "    {",
            "        OFFSET 0.0 0.5 0.0",
            "        CHANNELS 9 Xposition Yposition Zposition"
            " Zrotation Xrotation Yrotation Xscale Yscale Zscale",
            "        JOINT Head1",
            "        {",
            "            OFFSET 0.0 0.4 0.1",
            "            CHANNELS 9 Xposition Yposition Zposition"
            " Zrotation Xrotation Yrotation Xscale Yscale Zscale",
            "            End Site",
            "            {",
            "                OFFSET 0.0 0.2 0.0",
            "            }",
            "        }",
            "    }",
            "}",
            "MOTION",
            "Frames: 2",
            "Frame Time: 0.016667",
        ])
        rng = np.random.default_rng(11)
        frames = np.round(rng.normal(size=(2, 3 + 9 * 2)), 4)
        body = "\n".join(" ".join(f"{v:.4f}" for v in row)
                         for row in frames)
        path = str(tmp_path / "clip9.bvh")
        with open(path, "w") as f:
            f.write(header + "\n" + body + "\n")

        ours = jbvh.load(path)
        ref = rbvh.load(path)

        assert ours["order"] == ref["order"] == "zxy"
        np.testing.assert_array_equal(ours["parents"], ref["parents"])
        np.testing.assert_allclose(ours["offsets"], ref["offsets"],
                                   atol=1e-6)
        np.testing.assert_allclose(ours["rotations"], ref["rotations"],
                                   atol=1e-6)
        np.testing.assert_allclose(ours["positions"], ref["positions"],
                                   atol=1e-6)
        # spot-check the semantics directly: joint j>0 position =
        # offset + chan_pos * chan_scale; root rotation stays zero
        j1 = frames[:, 3:12]
        np.testing.assert_allclose(
            ours["positions"][:, 1],
            np.asarray([0.0, 0.5, 0.0]) + j1[:, 0:3] * j1[:, 6:9],
            atol=1e-6)
        np.testing.assert_array_equal(ours["rotations"][:, 0], 0.0)

    def test_stream_io(self):
        data = make_mocha_bvh_data(T=4, seed=2)
        buf = _io.StringIO()
        jbvh.save(buf, data)
        buf.seek(0)
        ours = jbvh.load(buf)
        assert ours["rotations"].shape == (4, 24, 3)


class TestDatabaseCodec:
    def _fake_db(self, seed=0):
        rng = np.random.RandomState(seed)
        F, B, R, C = 50, 25, 3, 2
        return {
            "bone_positions": rng.randn(F, B, 3).astype(np.float32),
            "bone_velocities": rng.randn(F, B, 3).astype(np.float32),
            "bone_rotations": rng.randn(F, B, 4).astype(np.float32),
            "bone_angular_velocities": rng.randn(F, B, 3).astype(np.float32),
            "bone_parents": MOCHA_PARENTS_25.astype(np.int32),
            "range_starts": np.array([0, 20, 35], np.int32),
            "range_stops": np.array([20, 35, 50], np.int32),
            "style_labels": np.array([1, 2, 3], np.int32),
            "action_labels": np.array([4, 5, 6], np.int32),
            "contact_states": (rng.rand(F, C) > 0.5).astype(np.uint8),
        }

    def test_roundtrip(self, tmp_path):
        db = self._fake_db()
        path = str(tmp_path / "database.bin")
        jdb.save_database(path, db)
        out = jdb.load_database(path)
        for k, v in db.items():
            np.testing.assert_array_equal(out[k], v, err_msg=k)

    def test_reference_reader_reads_our_file(self, tmp_path):
        db = self._fake_db(seed=5)
        path = str(tmp_path / "database.bin")
        jdb.save_database(path, db)
        ref = rutils.load_database(path)
        np.testing.assert_array_equal(ref["bone_positions"], db["bone_positions"])
        np.testing.assert_array_equal(ref["bone_rotations"], db["bone_rotations"])
        np.testing.assert_array_equal(ref["content_labels"], db["action_labels"])
        np.testing.assert_array_equal(
            ref["contact_states"], db["contact_states"].astype(np.int8)
        )

    def test_features_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        path = str(tmp_path / "features.bin")
        feats = rng.randn(40, 7).astype(np.float32)
        offset = rng.randn(7).astype(np.float32)
        scale = rng.rand(7).astype(np.float32)
        jdb.save_features(path, feats, offset, scale)
        out = jdb.load_features(path)
        np.testing.assert_array_equal(out["features"], feats)
        ref = rutils.load_features(path)
        np.testing.assert_array_equal(ref["features"], feats)
        np.testing.assert_array_equal(ref["features_offset"], offset)
        np.testing.assert_array_equal(ref["features_scale"], scale)


MOCHA_PARENTS_25 = np.concatenate([[-1], MOCHA_PARENTS + 1])


class TestFilters:
    @pytest.mark.parametrize("window,order", [(15, 3), (31, 3), (9, 2)])
    def test_savgol_matches_scipy_interp(self, window, order):
        rng = np.random.RandomState(0)
        x = rng.randn(100, 4).astype(np.float64)
        ref = signal.savgol_filter(x, window, order, axis=0, mode="interp")
        with jax.enable_x64(True):
            ours = pre.savgol_filter(jnp.asarray(x), window, order)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-9)

    def test_savgol_f32(self):
        rng = np.random.RandomState(1)
        x = rng.randn(80, 3).astype(np.float32)
        ref = signal.savgol_filter(x.astype(np.float64), 15, 3, axis=0, mode="interp")
        ours = pre.savgol_filter(jnp.asarray(x), 15, 3)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)

    @pytest.mark.parametrize("size", [3, 5, 6])
    def test_median_vote_matches_ndimage(self, size):
        rng = np.random.RandomState(2)
        for trial in range(5):
            c = (rng.rand(200, 2) > 0.5)
            ref = np.stack(
                [ndimage.median_filter(c[:, i], size=size, mode="nearest")
                 for i in range(2)], axis=1)
            ours = np.asarray(pre.median_vote(jnp.asarray(c), size=size))
            np.testing.assert_array_equal(ours, ref)


class TestMirrorAndFeaturize:
    def test_mirror_matches_reference(self):
        data = make_mocha_bvh_data(T=20, seed=7)
        rot = rq.unroll(rq.from_euler(np.radians(data["rotations"]), order="zyx"))
        pos = data["positions"] * 0.01
        ref_r, ref_p = ref_mirror(rot, pos, data["names"], data["parents"])
        with jax.enable_x64(True):
            our_r, our_p = pre.animation_mirror(
                jnp.asarray(rot), jnp.asarray(pos), data["names"], data["parents"]
            )
        np.testing.assert_allclose(np.asarray(our_p), ref_p, atol=1e-10)
        # quaternions equal up to sign
        dot = np.abs(np.sum(np.asarray(our_r) * ref_r, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-10)

    @pytest.mark.parametrize("mirror", [False, True])
    def test_featurize_matches_process_data_f64(self, mirror):
        data = make_mocha_bvh_data(T=100, seed=11)
        ref_windows, ref_parents, ref_names = ref_process_data(
            {k: (v.copy() if isinstance(v, np.ndarray) else v)
             for k, v in data.items()},
            window=60, window_step=1, divide=True, mirror=mirror)
        rpos = np.array(ref_windows[0])
        rvel = np.array(ref_windows[1])
        rrot = np.array(ref_windows[2])
        rang = np.array(ref_windows[3])
        rcon = np.array(ref_windows[4])

        with jax.enable_x64(True):
            feats = pre.featurize_clip(
                jnp.asarray(data["rotations"]),
                jnp.asarray(data["positions"]),
                data["order"], data["names"], data["parents"],
                mirror=mirror, contact_velocity_threshold=0.5)
            w = win.window_features(feats, window=60, step=1, padded=True)

        np.testing.assert_array_equal(feats["bone_parents"], ref_parents)
        assert feats["bone_names"] == ref_names
        np.testing.assert_allclose(np.asarray(w["positions"]), rpos, atol=1e-8)
        np.testing.assert_allclose(np.asarray(w["velocities"]), rvel, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w["angular_velocities"]), rang, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(w["contacts"]), rcon.astype(bool))
        # rotations agree up to quaternion sign
        dot = np.abs(np.sum(np.asarray(w["rotations"]) * rrot, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-8)
        # and exactly including sign (unroll semantics preserved)
        np.testing.assert_allclose(np.asarray(w["rotations"]), rrot, atol=1e-6)

    def test_featurize_f32_close_to_f64(self):
        data = make_mocha_bvh_data(T=90, seed=13)
        f32 = pre.featurize_clip_jit(data, mirror=False)
        with jax.enable_x64(True):
            f64 = pre.featurize_clip(
                jnp.asarray(data["rotations"]), jnp.asarray(data["positions"]),
                data["order"], data["names"], data["parents"], mirror=False)
        np.testing.assert_allclose(
            np.asarray(f32["positions"]), np.asarray(f64["positions"]), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(f32["velocities"]), np.asarray(f64["velocities"]), atol=2e-2)

    def test_whole_clip_reflect_padding(self):
        data = make_mocha_bvh_data(T=45, seed=17)
        # ref_process_data mutates its input arrays in place -> pass copies
        ref_windows, _, _ = ref_process_data(
            {k: (v.copy() if isinstance(v, np.ndarray) else v)
             for k, v in data.items()},
            window=60, window_step=1, divide=False, mirror=False)
        with jax.enable_x64(True):
            feats = pre.featurize_clip(
                jnp.asarray(data["rotations"]), jnp.asarray(data["positions"]),
                data["order"], data["names"], data["parents"], mirror=False)
            padded = win.whole_clip_padded(feats)
        np.testing.assert_allclose(
            np.asarray(padded["positions"]), np.array(ref_windows[0][0]), atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(padded["rotations"]), np.array(ref_windows[2][0]), atol=1e-8)

    def test_training_windows_drop_short(self):
        idx = win.full_window_indices(100, 60, 20)
        assert idx.shape == (3, 60)  # starts 0,20,40; 60/80 dropped
        assert idx[-1, 0] == 40


class TestGoldenStability:
    def test_database_build_is_byte_stable(self, tmp_path):
        """Same BVH in -> bit-identical database.bin out (SURVEY.md §7
        golden-file requirement)."""
        from test_dataset import build_synthetic_database

        p1, p2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
        build_synthetic_database(p1, n_clips=1, T=100)
        build_synthetic_database(p2, n_clips=1, T=100)
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_bvh_save_is_byte_stable(self, tmp_path):
        data = make_mocha_bvh_data(T=12, seed=5)
        a, b = str(tmp_path / "a.bvh"), str(tmp_path / "b.bvh")
        jbvh.save(a, data)
        jbvh.save(b, data)
        assert open(a).read() == open(b).read()
