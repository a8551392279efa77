"""Dataset parity: our MotionDataset vs the reference data_loader on a
synthetic database built from synthetic clips."""

import os

import numpy as np
import pytest

import jax

from conftest import add_reference_paths, reference_available
from helpers import make_mocha_bvh_data

from mocha_sigasia2023_tpu.data import preprocess as pre
from mocha_sigasia2023_tpu.data.dataset import (
    MotionDataset, compute_norm_stats, iterate_batches,
)
from mocha_sigasia2023_tpu.io.database import save_database

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo unavailable", allow_module_level=True)

add_reference_paths()
import data_loader as ref_dl  # noqa: E402


def build_synthetic_database(path, n_clips=3, T=140):
    """Featurize synthetic clips (orig + mirrored) into a database.bin."""
    pos, vel, rot, ang, con = [], [], [], [], []
    starts, stops, styles, actions = [], [], [], []
    parents = None
    for i in range(n_clips):
        data = make_mocha_bvh_data(T=T, seed=100 + i)
        for mirror in (False, True):
            f = pre.featurize_clip_jit(data, mirror=mirror,
                                       contact_velocity_threshold=0.2)
            pos.append(np.asarray(f["positions"], np.float32))
            vel.append(np.asarray(f["velocities"], np.float32))
            rot.append(np.asarray(f["rotations"], np.float32))
            ang.append(np.asarray(f["angular_velocities"], np.float32))
            con.append(np.asarray(f["contacts"], np.uint8))
            off = 0 if not stops else stops[-1]
            starts.append(off)
            stops.append(off + T)
            styles.append(i % 5)
            actions.append(i % 3)
            parents = f["bone_parents"]
    db = {
        "bone_positions": np.concatenate(pos),
        "bone_velocities": np.concatenate(vel),
        "bone_rotations": np.concatenate(rot),
        "bone_angular_velocities": np.concatenate(ang),
        "bone_parents": np.asarray(parents, np.int32),
        "range_starts": np.asarray(starts, np.int32),
        "range_stops": np.asarray(stops, np.int32),
        "style_labels": np.asarray(styles, np.int32),
        "action_labels": np.asarray(actions, np.int32),
        "contact_states": np.concatenate(con),
    }
    save_database(path, db)
    return db


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mocha60")
    build_synthetic_database(str(d / "database.bin"))
    return str(d)


class TestMotionDataset:
    def test_matches_reference_dataset(self, data_dir):
        ours = MotionDataset(data_dir, "train")
        # reference computes (and would cache) norm.npz; ours already wrote
        # it, so the reference just loads the same windows
        ref = ref_dl.MotionDataset(data_dir, "train")

        assert len(ours) == len(ref)
        np.testing.assert_array_equal(ours.label, ref.label)
        np.testing.assert_allclose(ours.contact, ref.contact, atol=0)
        np.testing.assert_allclose(ours.X, ref.X, atol=2e-4)
        np.testing.assert_allclose(ours.Y, ref.Y, atol=2e-4)
        np.testing.assert_allclose(ours.root, ref.root, atol=2e-4)

    def test_norm_stats_match_reference(self, data_dir, tmp_path):
        ours = MotionDataset(data_dir, "train")
        stats = compute_norm_stats(ours.X, ours.Y, ours.root)
        ref = ref_dl.MotionDataset(data_dir, "train")
        ref_stats = {
            "X_mean": np.concatenate([
                ref.X[..., :3].mean(axis=(0, 1)),
                ref.X[..., 3:9].mean(axis=(0, 1)),
                ref.X[..., 9:12].mean(axis=(0, 1)),
                ref.X[..., 12:15].mean(axis=(0, 1))], axis=-1),
        }
        np.testing.assert_allclose(
            stats["X_mean"], ref.X.mean(axis=(0, 1)), atol=2e-4)
        np.testing.assert_allclose(
            stats["Y_mean"], ref.Y.mean(axis=(0, 1)), atol=2e-4)
        # the cached norm.npz matches what we computed
        np.testing.assert_allclose(ours.norm["X_mean"], stats["X_mean"], atol=1e-6)

    def test_batch_iterator(self, data_dir):
        ds = MotionDataset(data_dir, "train")
        batches = list(iterate_batches(ds, 8, shuffle=True, seed=1))
        assert all(b["X"].shape == (8, 60, 25, 15) for b in batches)
        assert len(batches) == len(ds) // 8
        # epochs reshuffle deterministically
        b0 = next(iter(iterate_batches(ds, 8, shuffle=True, seed=1, epoch=0)))
        b0b = next(iter(iterate_batches(ds, 8, shuffle=True, seed=1, epoch=0)))
        np.testing.assert_array_equal(b0["X"], b0b["X"])

    def test_prefetch_matches_sync(self, data_dir):
        """prefetch_batches (the DataLoader(num_workers) equivalent) must
        yield exactly the synchronous iterator's batches, in order, and
        propagate worker exceptions."""
        from mocha_sigasia2023_tpu.data.dataset import prefetch_batches

        ds = MotionDataset(data_dir, "train")
        sync = list(iterate_batches(ds, 8, shuffle=True, seed=3))
        pre_ = list(prefetch_batches(
            iterate_batches(ds, 8, shuffle=True, seed=3), depth=2))
        assert len(sync) == len(pre_)
        for a, b in zip(sync, pre_):
            for k in a:
                np.testing.assert_array_equal(a[k], np.asarray(b[k]))

        # device placement hook runs in the worker thread
        placed = list(prefetch_batches(
            iterate_batches(ds, 8, shuffle=True, seed=3),
            place=lambda b: {k: jax.numpy.asarray(v) for k, v in b.items()}))
        assert all(hasattr(b["X"], "devices") for b in placed)

        def boom():
            yield {"X": np.zeros(1)}
            raise RuntimeError("worker failed")

        it = prefetch_batches(boom())
        next(it)
        with pytest.raises(RuntimeError, match="worker failed"):
            list(it)

    def test_getitem_contract(self, data_dir):
        ds = MotionDataset(data_dir, "train")
        item = ds[0]
        assert item["X"].shape == (60, 25, 15)
        assert item["Y"].shape == (60, 25, 15)
        assert item["root"].shape == (60, 6)
        assert item["contact"].shape == (60, 2)
