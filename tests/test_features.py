"""Feature-export pipeline tests (cnt_norm + per-character CVAE features).

Covers runtime.features.encode_database / collect_character_features /
compute_cnt_norm — the roles of /root/reference/compute_cnt_norm.py and
collect_CVAE_feature_action.py.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import add_reference_paths, reference_available

from mocha_sigasia2023_tpu.io.database import load_database
from mocha_sigasia2023_tpu.models import GeneratorConfig, convert
from mocha_sigasia2023_tpu.runtime import features as rtf
from mocha_sigasia2023_tpu.data.dataset import (
    MotionDataset, compute_norm_stats,
)

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo unavailable", allow_module_level=True)

add_reference_paths()
from test_dataset import build_synthetic_database  # noqa: E402
from test_models import MODEL_CFG  # noqa: E402
from model import Generator as RefGenerator  # noqa: E402
from transformer import mean_variance_norm as ref_mvn  # noqa: E402
import quat as rq  # noqa: E402


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("feat_ds")
    build_synthetic_database(str(d / "database.bin"), n_clips=2, T=140)
    db = load_database(str(d / "database.bin"))
    # norm stats via the dataset path (also writes norm.npz)
    ds = MotionDataset(str(d), "train")
    torch.manual_seed(5)
    ref_gen = RefGenerator(MODEL_CFG).eval()
    cfg = GeneratorConfig.from_dict(MODEL_CFG)
    params = jax.tree.map(jnp.asarray,
                          convert.generator_from_torch(ref_gen.state_dict()))
    return dict(db=db, norm=ds.norm, cfg=cfg, params=params, ref_gen=ref_gen)


class TestEncodeDatabase:
    def test_matches_reference_encoder_pass(self, setup):
        """encode_database must equal running the torch reference encoder
        over the same normalized windows (compute_cnt_norm.py:131-169)."""
        s = setup
        encoded, cnt, styles, actions = rtf.encode_database(
            s["db"], s["params"], s["cfg"], s["norm"], window=60, step=20)

        # reproduce the reference pipeline for the same windows
        from mocha_sigasia2023_tpu.data.dataset import window_xy_features
        idx, styles2, actions2 = rtf.database_window_features(
            s["db"], window=60, step=20)
        X, _, _ = window_xy_features(
            jnp.asarray(s["db"]["bone_rotations"].astype(np.float32)[idx]),
            jnp.asarray(s["db"]["bone_positions"].astype(np.float32)[idx]),
            jnp.asarray(s["db"]["bone_velocities"].astype(np.float32)[idx]),
            jnp.asarray(s["db"]["bone_angular_velocities"].astype(np.float32)[idx]),
            s["db"]["bone_parents"])
        X = np.asarray(X)
        Xn = (X[:, :, 1:] - s["norm"]["X_mean"][None, None, 1:]) \
            / s["norm"]["X_std"][None, None, 1:]
        model = s["ref_gen"]
        with torch.no_grad():
            tokens = model.mot_embedding(torch.as_tensor(Xn))
            tokens = tokens + model.pos_emb[:, : tokens.shape[1]]
            ref_encoded = model.encoder(tokens)
            ref_cnt = ref_mvn(ref_encoded.permute(0, 2, 1)).permute(0, 2, 1)
        np.testing.assert_allclose(encoded, ref_encoded.numpy(), atol=5e-4)
        np.testing.assert_allclose(cnt, ref_cnt.numpy(), atol=5e-3)
        np.testing.assert_array_equal(styles, styles2)
        np.testing.assert_array_equal(actions, actions2)

    def test_cnt_norm_stats(self, setup):
        s = setup
        encoded, cnt, _, _ = rtf.encode_database(
            s["db"], s["params"], s["cfg"], s["norm"])
        stats = rtf.compute_cnt_norm(encoded, cnt)
        assert stats["mean"].shape == (90, 256)
        np.testing.assert_allclose(stats["mean"], cnt.mean(axis=0), atol=1e-6)


class TestCollectCharacterFeatures:
    def test_range_bookkeeping_matches_reference_slicing(self, setup):
        """collect_CVAE_feature_action.py:119-129: per selected clip, the
        window count is total_frames - window and ranges are contiguous."""
        s = setup
        db = s["db"]
        styles = sorted(set(int(x) for x in db["style_labels"]))
        actions = sorted(set(int(x) for x in db["action_labels"]))
        out = rtf.collect_character_features(
            db, s["params"], s["cfg"], s["norm"],
            style_labels=styles[:1], action_labels=actions, window=60)

        sel = [i for i in range(len(db["range_starts"]))
               if int(db["style_labels"][i]) == styles[0]]
        expected = sum(
            int(db["range_stops"][i] - db["range_starts"][i]) - 60
            for i in sel)
        assert out["encoded"].shape[0] == expected
        assert out["range_stops"][-1] == expected
        assert len(out["range_starts"]) == len(sel)
        assert out["action_label"].shape == (expected,)

    def test_clip_filter_empty_raises(self, setup):
        s = setup
        with pytest.raises(ValueError):
            rtf.database_window_features(
                s["db"], clip_filter=lambda st, ac: False)


class TestTailForms:
    def test_tail_vel_ang_equal_full_window_last_row(self):
        """_tail_vel/_tail_ang (the r4 featurize trim: compute only the Y
        rows the stream reads) must equal window_vel/window_ang's last row
        BITWISE — same arithmetic on the same 4 trailing rows."""
        from mocha_sigasia2023_tpu.data.dataset import window_ang, window_vel
        from mocha_sigasia2023_tpu.kinematics import quat as jq
        from mocha_sigasia2023_tpu.runtime.features import _tail_ang, _tail_vel

        rng = np.random.RandomState(7)
        pos = jnp.asarray(rng.randn(5, 60, 25, 3).astype(np.float32))
        rot = jq.normalize(jnp.asarray(
            rng.randn(5, 60, 25, 4).astype(np.float32)))
        np.testing.assert_array_equal(
            np.asarray(window_vel(pos)[:, -1]),
            np.asarray(_tail_vel(pos[:, -4:])))
        np.testing.assert_array_equal(
            np.asarray(window_ang(rot)[:, -1]),
            np.asarray(_tail_ang(rot[:, -4:])))


class TestClipStreamFeaturesDevice:
    def test_matches_host_pipeline(self, setup):
        """The single-program device featurizer (bench --e2e path) must
        equal the host-side clip_stream_features stage for stage."""
        from helpers import make_mocha_bvh_data

        s = setup
        clip = make_mocha_bvh_data(T=150, seed=3)
        host = rtf.clip_stream_features(clip, s["params"], s["cfg"],
                                        s["norm"])
        dev = rtf.clip_stream_features_device(clip, s["params"], s["cfg"],
                                              s["norm"])
        assert list(dev["bone_names"]) == list(host["bone_names"])
        np.testing.assert_array_equal(dev["bone_parents"],
                                      host["bone_parents"])
        for k in ("encoded", "cnt", "pos_last", "rot_last", "vel_last",
                  "ang_last", "rvel_last", "rang_last", "contact_last",
                  "hips_speed_mean"):
            np.testing.assert_allclose(
                np.asarray(dev[k]), np.asarray(host[k]), atol=2e-4,
                err_msg=k)

    def test_batched_multi_clip_equals_per_clip(self, setup):
        """batch_stream_features_device (one program for S clips, emitting
        frame0/xs directly) must equal stacking per-clip results."""
        from helpers import make_mocha_bvh_data

        s = setup
        clips = [make_mocha_bvh_data(T=90, seed=10 + i) for i in range(3)]
        frame0, xs = rtf.batch_stream_features_device(
            clips, s["params"], s["cfg"], s["norm"], chunk=64)

        per = [rtf.clip_stream_features_device(c, s["params"], s["cfg"],
                                               s["norm"])
               for c in clips]
        for k in frame0:
            exp0 = np.stack([np.asarray(p[k][0]) for p in per])
            expx = np.stack([np.asarray(p[k][1:]) for p in per], axis=1)
            np.testing.assert_allclose(np.asarray(frame0[k]), exp0,
                                       atol=1e-5, err_msg=k)
            np.testing.assert_allclose(np.asarray(xs[k]), expx,
                                       atol=1e-5, err_msg=k)

    def test_ragged_grouped_equals_per_clip(self, setup):
        """batch_stream_features_ragged (the characterize --src-dir path:
        one dispatch per distinct clip length, merged back in input order
        with edge-padded window rows) must equal the per-clip device
        featurizer exactly on each clip's true window range."""
        from helpers import make_mocha_bvh_data

        s = setup
        lengths = [90, 110, 90, 100]
        clips = [make_mocha_bvh_data(T=L, seed=20 + i)
                 for i, L in enumerate(lengths)]
        frame0, xs, n_w, n_groups = rtf.batch_stream_features_ragged(
            clips, s["params"], s["cfg"], s["norm"], chunk=64)
        assert n_groups == 3  # lengths {90, 100, 110}
        assert n_w == [L - 15 for L in lengths]  # T - window//4 windows

        per = [rtf.clip_stream_features_device(c, s["params"], s["cfg"],
                                               s["norm"])
               for c in clips]
        w_max = max(n_w)
        for k in frame0:
            for i, p in enumerate(per):
                np.testing.assert_allclose(
                    np.asarray(frame0[k][i]), np.asarray(p[k][0]),
                    atol=1e-5, err_msg=f"{k} clip {i} frame0")
                got = np.asarray(xs[k][:, i])
                assert got.shape[0] == w_max - 1
                np.testing.assert_allclose(
                    got[:n_w[i] - 1], np.asarray(p[k][1:]),
                    atol=1e-5, err_msg=f"{k} clip {i}")
                # pad region repeats the clip's last true window row
                if n_w[i] < w_max:
                    np.testing.assert_array_equal(
                        got[n_w[i] - 1:],
                        np.broadcast_to(got[n_w[i] - 2],
                                        got[n_w[i] - 1:].shape))

    def test_chunked_equals_unchunked(self, setup):
        """lax.map chunking (long-clip memory bound) must not change
        results or window counts."""
        from helpers import make_mocha_bvh_data

        s = setup
        clip = make_mocha_bvh_data(T=150, seed=4)
        full = rtf.clip_stream_features_device(clip, s["params"], s["cfg"],
                                               s["norm"], chunk=256)
        small = rtf.clip_stream_features_device(clip, s["params"], s["cfg"],
                                                s["norm"], chunk=32)
        assert full["encoded"].shape == small["encoded"].shape == (135, 90, 256)
        for k in ("encoded", "pos_last", "hips_speed_mean"):
            np.testing.assert_allclose(
                np.asarray(full[k]), np.asarray(small[k]), atol=1e-5,
                err_msg=k)
