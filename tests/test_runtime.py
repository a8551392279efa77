"""Streaming-runtime tests.

The crown-jewel parity test re-implements the reference demo's frame loop
(test_fullframework.py:288-641) as a NumPy/torch oracle — reference quat +
Inertialization modules, sklearn BallTree, torch decoder — and requires our
fully-jitted scan to reproduce src / cm (NN) / trans (CVAE) / IK streams.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from conftest import add_reference_paths, reference_available
from helpers import make_mocha_bvh_data

from mocha_sigasia2023_tpu.data.dataset import compute_norm_stats, window_xy_features
from mocha_sigasia2023_tpu.models import (
    CVAEConfig, GeneratorConfig, convert, generator as jgen,
)
from mocha_sigasia2023_tpu.runtime import export as jexport
from mocha_sigasia2023_tpu.runtime import features as rtf
from mocha_sigasia2023_tpu.runtime import stream as rts
from mocha_sigasia2023_tpu.runtime.live import LiveCharacterizer
from mocha_sigasia2023_tpu.runtime.matching import ContextIndex
from mocha_sigasia2023_tpu.runtime.stream import IKConfig, RuntimeConsts

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo unavailable", allow_module_level=True)

add_reference_paths()
import quat as rq  # noqa: E402
import Inertialization as rinert  # noqa: E402
from model import Generator as RefGenerator  # noqa: E402
from model_CVAE import CVAE as RefCVAE  # noqa: E402
from test_models import MODEL_CFG  # noqa: E402

DT = 1.0 / 60.0


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(42)
    ref_gen = RefGenerator(MODEL_CFG).eval()
    ref_cvae = RefCVAE(output_seq=90, latent_dim=256, depth=2, nheads=4,
                       feedforward_dim=512, dropout=0.1,
                       activation=F.relu).eval()

    cfg = GeneratorConfig.from_dict(MODEL_CFG)
    params = jax.tree.map(jnp.asarray,
                          convert.generator_from_torch(ref_gen.state_dict()))
    cvae_cfg = CVAEConfig(output_seq=90)
    cvae_params = jax.tree.map(jnp.asarray,
                               convert.cvae_from_torch(ref_cvae.state_dict()))

    src_bvh = make_mocha_bvh_data(T=100, seed=21)
    cha_bvh = make_mocha_bvh_data(T=130, seed=22, walk_speed=60.0)

    # normalization stats from the character clip's own windows (any
    # consistent stats work; both sides share them)
    from mocha_sigasia2023_tpu.data import preprocess as pre
    from mocha_sigasia2023_tpu.data.windows import window_features
    feats = pre.featurize_clip_jit(cha_bvh)
    w = window_features(feats, 60, 10, padded=False)
    X, Y, root = window_xy_features(
        w["rotations"], w["positions"], w["velocities"],
        w["angular_velocities"], feats["bone_parents"])
    norm = compute_norm_stats(np.asarray(X), np.asarray(Y), np.asarray(root))

    src_feats = rtf.clip_stream_features(src_bvh, params, cfg, norm)
    cha_feats = rtf.clip_stream_features(cha_bvh, params, cfg, norm)

    # long clip for the >=500-frame drift bound (window 60 -> 501 frames)
    src_bvh_long = make_mocha_bvh_data(T=560, seed=23)
    src_feats_long = rtf.clip_stream_features(src_bvh_long, params, cfg, norm)

    cnt_mean = cha_feats["cnt"].mean(axis=0)
    cnt_std = cha_feats["cnt"].std(axis=0) + 1e-6
    enc_mean = cha_feats["encoded"].mean(axis=0)
    enc_std = cha_feats["encoded"].std(axis=0) + 1e-6

    consts = RuntimeConsts(
        Y_mean=jnp.asarray(norm["Y_mean"]),
        Y_std=jnp.asarray(norm["Y_std"]),
        cha_encoded=jnp.asarray(cha_feats["encoded"]),
        cha_cnt_flat=jnp.asarray(
            ((cha_feats["cnt"] - cnt_mean) / cnt_std).reshape(
                len(cha_feats["cnt"]), -1)),
        cha_cnt_sq=None,
        cnt_mean=jnp.asarray(cnt_mean),
        cnt_std=jnp.asarray(cnt_std),
        src_cnt_mean=jnp.asarray(cnt_mean),
        src_cnt_std=jnp.asarray(cnt_std),
        cha_encoded_mean=jnp.asarray(enc_mean),
        cha_encoded_std=jnp.asarray(enc_std),
    )
    consts = consts._replace(
        cha_cnt_sq=jnp.sum(consts.cha_cnt_flat ** 2, axis=-1))

    return dict(ref_gen=ref_gen, ref_cvae=ref_cvae, cfg=cfg, params=params,
                cvae_cfg=cvae_cfg, cvae_params=cvae_params, norm=norm,
                src_feats=src_feats, src_feats_long=src_feats_long,
                cha_feats=cha_feats, consts=consts,
                parents=src_feats["bone_parents"],
                names=src_feats["bone_names"])


class TestStreamSmoke:
    def test_characterize_runs_and_shapes(self, setup):
        s = setup
        out = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True)
        N = len(s["src_feats"]["encoded"])
        assert out["trans_pos"].shape == (N, 25, 3)
        assert out["ik_rot"].shape == (N, 25, 4)
        assert np.all(np.isfinite(out["trans_pos"]))
        assert np.all(np.isfinite(out["ik_rot"]))

    def test_export_bvh_roundtrip(self, setup, tmp_path):
        s = setup
        out = rts.characterize_clip(
            s["params"], s["cfg"], None, None,
            s["consts"], s["parents"], s["src_feats"])
        path = str(tmp_path / "ours.bvh")
        jexport.save_characterized_bvh(
            path, out["ik_pos"], out["ik_rot"], s["parents"],
            s["names"][1:])
        from mocha_sigasia2023_tpu.io import bvh as jbvh
        loaded = jbvh.load(path)
        assert loaded["rotations"].shape[0] == out["ik_pos"].shape[0]
        assert len(loaded["names"]) == 24


def reference_oracle_loop(s, sf=None):
    """NumPy/torch re-implementation of the reference demo frame loop
    (test_fullframework.py:288-641) used as the parity oracle."""
    from sklearn.neighbors import BallTree

    model = s["ref_gen"]
    cvae = s["ref_cvae"]
    norm = s["norm"]
    sf = s["src_feats"] if sf is None else sf
    cf = s["cha_feats"]
    parents = np.asarray(s["parents"])
    contact_bones = np.array([5, 24])

    Y_mean = norm["Y_mean"][None]
    Y_std = norm["Y_std"][None]
    cnt_mean = np.asarray(s["consts"].cnt_mean)
    cnt_std = np.asarray(s["consts"].cnt_std)
    enc_mean = np.asarray(s["consts"].cha_encoded_mean)
    enc_std = np.asarray(s["consts"].cha_encoded_std)

    ik_max_length_buffer, ik_foot_height = 0.015, 0.02
    ik_unlock_radius, ik_halflife = 0.2, 0.1

    cha_cnt_nm = (cf["cnt"] - cnt_mean[None]) / cnt_std[None]
    tree = BallTree(cha_cnt_nm.reshape(len(cf["cnt"]), -1))

    def decode(src_enc, cha_enc):
        with torch.no_grad():
            tok = model.decoder(torch.as_tensor(src_enc[None]),
                                torch.as_tensor(cha_enc[None]))
            Ytil = model.to_mot(tok)[0].numpy()
        Ytil = Ytil * Y_std[:, 1:] + Y_mean[:, 1:]
        pos = Ytil[-1, :, :3]
        txy = Ytil[-1, :, 3:9].reshape(-1, 3, 2)
        vel_full = Ytil[..., 9:12]
        ang = Ytil[-1, :, 12:15]
        rot = rq.from_xform_xy(txy)
        return pos, rot, vel_full, ang

    def cvae_sample_det(condition):
        with torch.no_grad():
            out = cvae.sample(torch.as_tensor(condition[None]),
                              deterministic=True)[0].numpy()
        return out

    N = len(sf["encoded"])
    I4 = np.array([1.0, 0, 0, 0], np.float32)

    # ---- frame 0 (test_fullframework.py:288-435) -------------------------
    idx0 = tree.query(((sf["cnt"][0] - cnt_mean) / cnt_std)
                      .reshape(1, -1), k=1, return_distance=False)[0, 0]
    prev_cha_encoded = cf["encoded"][idx0]

    t_pos, t_rot, t_vel_full, t_ang = decode(sf["encoded"][0], prev_cha_encoded)

    src_rootvel = rq.mul_vec(I4, sf["rvel_last"][0])
    src_rootang = rq.mul_vec(I4, sf["rang_last"][0])
    src_rootpos = src_rootvel * DT
    src_rootrot = rq.mul(I4, rq.from_scaled_angle_axis(src_rootang * DT))
    src_pose = [dict(pos=sf["pos_last"][0].copy(), rot=sf["rot_last"][0].copy())]
    src_pose[0]["pos"][0] = src_rootpos
    src_pose[0]["rot"][0] = src_rootrot

    ratio = np.linalg.norm(t_vel_full[:, 0], axis=1).mean() / sf["hips_speed_mean"][0]
    if ratio > 3.0 or ratio < 0.33:
        ratio = 1.0
    t_rvel = sf["rvel_last"][0] * ratio
    t_rang = sf["rang_last"][0]
    t_rootvel = rq.mul_vec(I4, t_rvel)
    t_rootang = rq.mul_vec(I4, t_rang)
    t_rootpos = t_rootvel * DT
    t_rootrot = rq.mul(I4, rq.from_scaled_angle_axis(t_rootang * DT))

    trans_pos = np.concatenate([t_rootpos[None], t_pos], axis=0)
    trans_vel = np.concatenate([t_rootvel[None], t_vel_full[-1]], axis=0)
    trans_rot = np.concatenate([t_rootrot[None], t_rot], axis=0)
    trans_ang = np.concatenate([t_rootang[None], t_ang], axis=0)

    trans_pos_list = [trans_pos]
    trans_rot_list = [trans_rot]
    ik_pos_list = [trans_pos]
    ik_rot_list = [trans_rot]
    cm_pos_list = [trans_pos]
    cm_rot_list = [trans_rot]

    # contact init (:391-431)
    contact_states = np.zeros(2, bool)
    contact_locks = np.zeros(2, bool)
    contact_positions = np.zeros((2, 3))
    contact_velocities = np.zeros((2, 3))
    contact_points = np.zeros((2, 3))
    contact_targets = np.zeros((2, 3))
    contact_off_p = np.zeros((2, 3))
    contact_off_v = np.zeros((2, 3))
    for bs in range(2):
        bp, bv, _, _ = rq.fk_vel_bone(
            trans_pos, trans_vel, trans_rot, trans_ang, parents,
            contact_bones[bs])
        contact_positions[bs] = bp
        contact_velocities[bs] = bv
        contact_points[bs] = bp
        contact_targets[bs] = bp

    # ---- frames 1..N-1 ----------------------------------------------------
    for i in range(1, N):
        idx = tree.query(((sf["cnt"][i] - cnt_mean) / cnt_std)
                         .reshape(1, -1), k=1, return_distance=False)[0, 0]
        condition = np.concatenate([
            (sf["cnt"][i] - cnt_mean) / cnt_std,
            (prev_cha_encoded - enc_mean) / enc_std], axis=0)
        vae_out = cvae_sample_det(condition.astype(np.float32))
        curr_cha_encoded = vae_out * enc_std + enc_mean
        prev_cha_encoded = curr_cha_encoded.copy()

        t_pos, t_rot, t_vel_full, t_ang = decode(
            sf["encoded"][i], curr_cha_encoded.astype(np.float32))
        c_pos, c_rot, c_vel_full, c_ang = decode(
            sf["encoded"][i], cf["encoded"][idx])

        # src root integration (:476-489)
        pr = src_pose[-1]["rot"][0]
        src_rootvel = rq.mul_vec(pr, sf["rvel_last"][i])
        src_rootang = rq.mul_vec(pr, sf["rang_last"][i])
        src_rootpos = src_pose[-1]["pos"][0] + src_rootvel * DT
        src_rootrot = rq.mul(pr, rq.from_scaled_angle_axis(src_rootang * DT))
        pose = dict(pos=sf["pos_last"][i].copy(), rot=sf["rot_last"][i].copy())
        pose["pos"][0] = src_rootpos
        pose["rot"][0] = src_rootrot
        src_pose.append(pose)

        # trans stream (:492-509)
        ratio = np.linalg.norm(t_vel_full[:, 0], axis=1).mean() / sf["hips_speed_mean"][i]
        if ratio > 3.0 or ratio < 0.33:
            ratio = 1.0
        t_rvel = sf["rvel_last"][i] * ratio
        t_rang = sf["rang_last"][i]
        prev_rot0 = trans_rot_list[-1][0]
        t_rootvel = rq.mul_vec(prev_rot0, t_rvel)
        t_rootang = rq.mul_vec(prev_rot0, t_rang)
        t_rootpos = trans_pos_list[-1][0] + t_rootvel * DT
        t_rootrot = rq.mul(prev_rot0, rq.from_scaled_angle_axis(t_rootang * DT))
        trans_pos = np.concatenate([t_rootpos[None], t_pos], axis=0)
        trans_vel = np.concatenate([t_rootvel[None], t_vel_full[-1]], axis=0)
        trans_rot = np.concatenate([t_rootrot[None], t_rot], axis=0)

        # cm stream (:512-528)
        c_ratio = np.linalg.norm(c_vel_full[:, 0], axis=1).mean() / sf["hips_speed_mean"][i]
        if c_ratio > 3.0 or c_ratio < 0.33:
            c_ratio = 1.0
        c_rvel = sf["rvel_last"][i] * c_ratio
        c_rang = sf["rang_last"][i]
        c_prev_rot0 = cm_rot_list[-1][0]
        c_rootvel = rq.mul_vec(c_prev_rot0, c_rvel)
        c_rootang = rq.mul_vec(c_prev_rot0, c_rang)
        c_rootpos = cm_pos_list[-1][0] + c_rootvel * DT
        c_rootrot = rq.mul(c_prev_rot0, rq.from_scaled_angle_axis(c_rang * 0 + c_rootang * DT))
        cm_pos_list.append(np.concatenate([c_rootpos[None], c_pos], axis=0))
        cm_rot_list.append(np.concatenate([c_rootrot[None], c_rot], axis=0))

        # IK fixup (:530-623)
        bone_positions = ((ik_pos_list[-1] + trans_vel * DT) * 0.5
                          + trans_pos * 0.5).copy()
        bone_rotations = trans_rot.copy()
        adjusted_pos = bone_positions.copy()
        adjusted_rot = bone_rotations.copy()
        curr_contacts = sf["contact_last"][i].astype(bool)

        gbp = np.zeros((len(parents), 3))
        gbr = np.zeros((len(parents), 4))
        gbc = np.zeros(len(parents), bool)
        for bs in range(2):
            toe = contact_bones[bs]
            heel = parents[toe]
            knee = parents[heel]
            hip = parents[knee]
            root_b = parents[hip]

            gbc[:] = False
            gbp, gbr, gbc = rq.fk_partial(
                gbp, gbr, gbc, bone_positions, bone_rotations, parents, toe)

            (contact_states[bs], contact_locks[bs], contact_positions[bs],
             contact_velocities[bs], contact_points[bs], contact_targets[bs],
             contact_off_p[bs], contact_off_v[bs]) = rinert.contact_update(
                contact_states[bs], contact_locks[bs], contact_positions[bs],
                contact_velocities[bs], contact_points[bs],
                contact_targets[bs], contact_off_p[bs], contact_off_v[bs],
                gbp[toe], bool(curr_contacts[bs]), ik_unlock_radius,
                ik_foot_height, ik_halflife, DT)

            clamp = contact_positions[bs]
            clamp[1] = max(clamp[1], ik_foot_height)

            for bone in [heel, knee, hip, root_b]:
                gbp, gbr, gbc = rq.fk_partial(
                    gbp, gbr, gbc, bone_positions, bone_rotations, parents, bone)

            adjusted_rot[hip], adjusted_rot[knee] = rq.ik_two_bone(
                adjusted_rot[hip], adjusted_rot[knee],
                gbp[hip], gbp[knee], gbp[heel],
                clamp + (gbp[heel] - gbp[toe]),
                rq.mul_vec(gbr[knee], np.array([0.0, 1.0, 0.0], np.float32)),
                gbr[hip], gbr[knee], gbr[root_b], ik_max_length_buffer)

        trans_pos_list.append(
            (trans_pos_list[-1] + trans_vel * DT) * 0.5 + trans_pos * 0.5)
        trans_rot_list.append(trans_rot)
        ik_pos_list.append(adjusted_pos)
        ik_rot_list.append(adjusted_rot)

    return {
        "src_pos": np.stack([p["pos"] for p in src_pose]),
        "src_rot": np.stack([p["rot"] for p in src_pose]),
        "trans_pos": np.stack(trans_pos_list),
        "trans_rot": np.stack(trans_rot_list),
        "ik_pos": np.stack(ik_pos_list),
        "ik_rot": np.stack(ik_rot_list),
        "cm_pos": np.stack(cm_pos_list),
        "cm_rot": np.stack(cm_rot_list),
    }


class TestStreamParity:
    def test_full_loop_matches_reference_oracle(self, setup):
        s = setup
        ours = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True)
        ref = reference_oracle_loop(s)

        np.testing.assert_allclose(ours["src_pos"], ref["src_pos"],
                                   atol=2e-3, rtol=1e-3)
        qd = np.abs(np.sum(ours["src_rot"] * ref["src_rot"], axis=-1))
        np.testing.assert_array_less(1.0 - 2e-4, qd)

        np.testing.assert_allclose(ours["cm_pos"], ref["cm_pos"],
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(ours["trans_pos"], ref["trans_pos"],
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(ours["ik_pos"], ref["ik_pos"],
                                   atol=1e-3, rtol=1e-3)
        qd = np.abs(np.sum(ours["ik_rot"] * ref["ik_rot"], axis=-1))
        np.testing.assert_array_less(1.0 - 5e-3, qd)

    def test_long_horizon_drift_under_1e3(self, setup):
        """BASELINE fidelity bound: joint positions within 1e-3 of the
        reference over a LONG horizon (501 integrated frames).  The root
        integrators and contact springs carry f64 (StreamCarry docstring);
        without that, f32 accumulation drifts to ~5e-3 by frame 100."""
        s = setup
        sf = s["src_feats_long"]
        assert len(sf["encoded"]) >= 500
        ours = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], sf, deterministic=True)
        ref = reference_oracle_loop(s, sf)

        for k in ("src_pos", "cm_pos", "trans_pos", "ik_pos"):
            err = np.abs(ours[k] - ref[k]).max()
            assert err <= 1e-3, f"{k}: max |err| {err:.2e} > 1e-3 @500 frames"
        qd = np.abs(np.sum(ours["ik_rot"] * ref["ik_rot"], axis=-1))
        np.testing.assert_array_less(1.0 - 1e-3, qd)


class TestDeterminism:
    def test_same_key_same_output(self, setup):
        s = setup
        out1 = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"],
            key=jax.random.PRNGKey(5))
        out2 = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"],
            key=jax.random.PRNGKey(5))
        np.testing.assert_array_equal(out1["ik_pos"], out2["ik_pos"])
        # a different key draws different CVAE noise -> bitwise different
        # trans stream (the random-init prior variance is tiny, so the
        # difference is small but must exist)
        out3 = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"],
            key=jax.random.PRNGKey(6))
        assert not np.array_equal(out1["trans_pos"], out3["trans_pos"])


class TestDroppedCntStream:
    """cnt is exactly mean_variance_norm(encoded) (model.py:96-98), so the
    r4 runtime re-derives it on demand instead of streaming a redundant
    (T, S, 90, 256) array next to encoded — halving per-frame stream
    inputs (the S=256 OOM was fed by exactly this)."""

    FEAT_KEYS = ("encoded", "cnt", "pos_last", "rot_last", "vel_last",
                 "ang_last", "rvel_last", "rang_last", "contact_last",
                 "hips_speed_mean")

    def test_batch_runner_dropped_cnt_matches_carried(self, setup):
        s = setup
        feats = {k: np.stack([np.asarray(s["src_feats"][k])] * 2)
                 for k in self.FEAT_KEYS}
        runner = rts.make_batch_runner(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], deterministic=True)
        keys = jax.random.split(jax.random.PRNGKey(3), 2)

        frame0, xs = rts.stack_stream_inputs(feats)
        a = jax.tree.map(np.asarray, runner(frame0, xs, keys))

        feats_nc = {k: v for k, v in feats.items() if k != "cnt"}
        f0b, xsb = rts.stack_stream_inputs(feats_nc)
        assert "cnt" not in f0b and "cnt" not in xsb
        b = jax.tree.map(np.asarray, runner(f0b, xsb, keys))

        np.testing.assert_array_equal(a["nn_index"], b["nn_index"])
        for k in ("trans_pos", "ik_pos", "cm_pos", "src_pos"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)

    def test_characterize_clip_without_cnt(self, setup):
        """The single-clip scan (in-scan NN match) must also accept
        cnt-less features — emit_cnt=False featurizer outputs."""
        s = setup
        feats_nc = {k: v for k, v in s["src_feats"].items() if k != "cnt"}
        a = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            key=jax.random.PRNGKey(5))
        b = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], feats_nc, deterministic=True,
            key=jax.random.PRNGKey(5))
        np.testing.assert_array_equal(a["nn_index"], b["nn_index"])
        for k in ("trans_pos", "ik_pos", "cm_pos"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)

    def test_emit_cnt_false_featurizer_drops_key(self, setup):
        s = setup
        clip = make_mocha_bvh_data(T=90, seed=31)
        out = rtf.clip_stream_features_device(
            clip, s["params"], s["cfg"], s["norm"], emit_cnt=False)
        assert "cnt" not in out and "encoded" in out
        full = rtf.clip_stream_features_device(
            clip, s["params"], s["cfg"], s["norm"])
        np.testing.assert_allclose(np.asarray(out["encoded"]),
                                   np.asarray(full["encoded"]), atol=1e-6)


class TestChunkedRunner:
    """runner.chunked streams HOST-resident xs to the device one time
    chunk at a time (bounded HBM residency — the S=256 play); the scan
    carry crosses chunk boundaries unchanged, so outputs must match the
    monolithic runner, including the RNG-key carry (non-deterministic
    mode) and a tail chunk that needs edge padding."""

    def test_chunked_equals_monolithic(self, setup):
        s = setup
        feats = {k: np.stack([np.asarray(s["src_feats"][k])] * 2)
                 for k in ("encoded", "pos_last", "rot_last", "vel_last",
                           "ang_last", "rvel_last", "rang_last",
                           "contact_last", "hips_speed_mean")}
        runner = rts.make_batch_runner(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], deterministic=False)
        keys = jax.random.split(jax.random.PRNGKey(3), 2)

        frame0, xs = rts.stack_stream_inputs(feats)
        a = jax.tree.map(np.asarray, runner(frame0, xs, keys))

        f0h, xsh = rts.stack_stream_inputs(feats, device=False)
        assert isinstance(xsh["encoded"], np.ndarray)
        T = xsh["encoded"].shape[0]
        tchunk = max(T // 3 + 1, 2)  # does not divide T: tail edge-pad
        assert T % tchunk != 0
        b = jax.tree.map(np.asarray,
                         runner.chunked(f0h, xsh, keys, tchunk=tchunk))
        np.testing.assert_array_equal(a["nn_index"], b["nn_index"])
        for k in ("trans_pos", "ik_pos", "cm_pos", "src_pos"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)

    def test_chunked_multi_character(self, setup):
        s = setup
        bf = s["src_feats"]
        cnt_mean = bf["cnt"].mean(axis=0)
        cnt_std = bf["cnt"].std(axis=0) + 1e-6
        flat = ((bf["cnt"] - cnt_mean) / cnt_std).reshape(len(bf["cnt"]),
                                                          -1)
        consts_b = s["consts"]._replace(
            cha_encoded=jnp.asarray(bf["encoded"]),
            cha_cnt_flat=jnp.asarray(flat),
            cha_cnt_sq=jnp.asarray((flat ** 2).sum(-1)),
            cnt_mean=jnp.asarray(cnt_mean), cnt_std=jnp.asarray(cnt_std),
            src_cnt_mean=jnp.asarray(cnt_mean),
            src_cnt_std=jnp.asarray(cnt_std),
            cha_encoded_mean=jnp.asarray(bf["encoded"].mean(axis=0)),
            cha_encoded_std=jnp.asarray(bf["encoded"].std(axis=0) + 1e-6))
        runner = rts.make_batch_runner(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            rts.stack_consts([s["consts"], consts_b]), s["parents"],
            deterministic=True, multi_character=True)
        feats = {k: np.stack([np.asarray(s["src_feats"][k])] * 3)
                 for k in ("encoded", "pos_last", "rot_last", "vel_last",
                           "ang_last", "rvel_last", "rang_last",
                           "contact_last", "hips_speed_mean")}
        cids = np.array([0, 1, 0], np.int32)
        keys = jnp.stack([jax.random.PRNGKey(3)] * 3)
        frame0, xs = rts.stack_stream_inputs(feats)
        a = jax.tree.map(np.asarray, runner(frame0, xs, keys, cids))
        f0h, xsh = rts.stack_stream_inputs(feats, device=False)
        b = jax.tree.map(np.asarray,
                         runner.chunked(f0h, xsh, keys, char_ids=cids,
                                        tchunk=7))
        np.testing.assert_array_equal(a["nn_index"], b["nn_index"])
        for k in ("trans_pos", "ik_pos", "cm_pos"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)


class TestDbBf16:
    def test_bf16_database_equals_prerounded_f32(self, setup):
        """cast_database (bf16 storage for the character stack — halves
        its HBM, fits the 30-style roster) must equal an f32 run whose
        database rows were pre-rounded through bf16: the bf16 operands
        promote exactly to f32 in the score matmul and the gathered
        encoded rows cast back to f32 at use."""
        s = setup

        def round16(a):
            return jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32)

        consts16 = rts.cast_database(s["consts"], jnp.bfloat16)
        assert consts16.cha_encoded.dtype == jnp.bfloat16
        assert consts16.cha_cnt_sq.dtype == jnp.float32
        consts_r = s["consts"]._replace(
            cha_encoded=round16(s["consts"].cha_encoded),
            cha_cnt_flat=round16(s["consts"].cha_cnt_flat))

        a = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            consts16, s["parents"], s["src_feats"], deterministic=True,
            key=jax.random.PRNGKey(5))
        b = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            consts_r, s["parents"], s["src_feats"], deterministic=True,
            key=jax.random.PRNGKey(5))
        np.testing.assert_array_equal(a["nn_index"], b["nn_index"])
        for k in ("trans_pos", "ik_pos", "cm_pos"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)
        assert np.all(np.isfinite(a["ik_pos"]))

    def test_bf16_database_close_to_f32(self, setup):
        """Serving quality vs the f32 stack: rounding the database rows
        perturbs NN scores and the decoder's character input by bf16 eps;
        the 0.5-blend decays it — positions stay within the documented
        bf16 serving envelope on this oracle clip."""
        s = setup
        consts16 = rts.cast_database(s["consts"], jnp.bfloat16)
        a = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            key=jax.random.PRNGKey(5))
        b = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            consts16, s["parents"], s["src_feats"], deterministic=True,
            key=jax.random.PRNGKey(5))
        same_nn = np.mean(a["nn_index"] == b["nn_index"])
        assert same_nn >= 0.9, f"NN picks diverged: {same_nn:.2%} identical"
        mask = (a["nn_index"] == b["nn_index"])
        diff = np.abs(a["trans_pos"] - b["trans_pos"])[mask].max()
        assert diff <= 2e-2, f"trans_pos diff {diff:.3e} on matched frames"


class TestFusedDecodes:
    def test_fused_decode_matches_separate(self, setup):
        """fuse_decodes=True (one K=2 batched decoder call per frame) must
        reproduce the separate-calls path; only matmul batching changes, so
        outputs agree to fp tolerance."""
        s = setup
        a = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            key=jax.random.PRNGKey(5))
        b = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            fuse_decodes=True, key=jax.random.PRNGKey(5))
        for k in ("trans_pos", "ik_pos", "cm_pos", "nn_index"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-4, rtol=1e-4,
                                       err_msg=k)


class TestLeanDecode:
    def test_lean_decode_matches_full(self, setup):
        """lean_decode=True (gen.decode_stream: last-frame pose + joint-0
        velocity track only) must reproduce the full-decoder path — the
        sliced temporal-conv windows and joint-0 graph support are
        exact-math restrictions."""
        s = setup
        a = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            lean_decode=False, key=jax.random.PRNGKey(5))
        b = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            lean_decode=True, key=jax.random.PRNGKey(5))
        for k in ("trans_pos", "ik_pos", "cm_pos", "nn_index"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-4, rtol=1e-4,
                                       err_msg=k)


class TestMultiCharacterServing:
    def test_per_stream_characters_match_single_runs(self, setup):
        """One batched session serving a DIFFERENT character per stream
        (multi_character=True: shared C-character database stack, padded
        with +inf-scored rows, per-stream char_ids gather) must reproduce
        each character's dedicated single-character runner exactly."""
        s = setup
        # character B: reuse the source clip as a second character database
        bf = s["src_feats"]
        cnt_mean = bf["cnt"].mean(axis=0)
        cnt_std = bf["cnt"].std(axis=0) + 1e-6
        enc_mean = bf["encoded"].mean(axis=0)
        enc_std = bf["encoded"].std(axis=0) + 1e-6
        flat = ((bf["cnt"] - cnt_mean) / cnt_std).reshape(len(bf["cnt"]), -1)
        consts_b = s["consts"]._replace(
            cha_encoded=jnp.asarray(bf["encoded"]),
            cha_cnt_flat=jnp.asarray(flat),
            cha_cnt_sq=jnp.asarray((flat ** 2).sum(-1)),
            cnt_mean=jnp.asarray(cnt_mean), cnt_std=jnp.asarray(cnt_std),
            src_cnt_mean=jnp.asarray(cnt_mean),
            src_cnt_std=jnp.asarray(cnt_std),
            cha_encoded_mean=jnp.asarray(enc_mean),
            cha_encoded_std=jnp.asarray(enc_std))
        consts_a = s["consts"]
        assert consts_a.cha_encoded.shape[0] != consts_b.cha_encoded.shape[0]

        feats2 = {k: np.stack([np.asarray(s["src_feats"][k])] * 2)
                  for k in LiveCharacterizer.FEAT_KEYS}
        frame0, xs = rts.stack_stream_inputs(feats2)
        keys = jnp.stack([jax.random.PRNGKey(3)] * 2)

        multi = rts.make_batch_runner(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            rts.stack_consts([consts_a, consts_b]), s["parents"],
            deterministic=True, multi_character=True)(
                frame0, xs, keys, np.array([0, 1], np.int32))

        for i, consts_i in enumerate([consts_a, consts_b]):
            feats1 = {k: v[:1] for k, v in feats2.items()}
            f0, x1 = rts.stack_stream_inputs(feats1)
            single = rts.make_batch_runner(
                s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
                consts_i, s["parents"], deterministic=True)(
                    f0, x1, keys[:1])
            for k in ("trans_pos", "ik_pos", "cm_pos", "nn_index"):
                np.testing.assert_allclose(
                    np.asarray(multi[k])[:, i], np.asarray(single[k])[:, 0],
                    atol=1e-5, rtol=1e-4, err_msg=f"stream {i} {k}")

    def test_unequal_character_counts_pad_the_grouped_matcher(self, setup):
        """An UNEQUAL character distribution (here 2+1 streams over 2
        characters) pads the grouped matcher's per-character query blocks
        (G = max count); the padded session must reproduce the equal-count
        session stream-for-stream."""
        s = setup
        bf = s["src_feats"]
        cnt_mean = bf["cnt"].mean(axis=0)
        cnt_std = bf["cnt"].std(axis=0) + 1e-6
        flat = ((bf["cnt"] - cnt_mean) / cnt_std).reshape(len(bf["cnt"]), -1)
        consts_b = s["consts"]._replace(
            cha_encoded=jnp.asarray(bf["encoded"]),
            cha_cnt_flat=jnp.asarray(flat),
            cha_cnt_sq=jnp.asarray((flat ** 2).sum(-1)),
            cnt_mean=jnp.asarray(cnt_mean), cnt_std=jnp.asarray(cnt_std),
            src_cnt_mean=jnp.asarray(cnt_mean),
            src_cnt_std=jnp.asarray(cnt_std),
            cha_encoded_mean=jnp.asarray(bf["encoded"].mean(axis=0)),
            cha_encoded_std=jnp.asarray(bf["encoded"].std(axis=0) + 1e-6))
        stack = rts.stack_consts([s["consts"], consts_b])

        runner = rts.make_batch_runner(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            stack, s["parents"], deterministic=True, multi_character=True)

        feats4 = {k: np.stack([np.asarray(s["src_feats"][k])] * 4)
                  for k in LiveCharacterizer.FEAT_KEYS}
        frame0_4, xs_4 = rts.stack_stream_inputs(feats4)
        keys4 = jnp.stack([jax.random.PRNGKey(3)] * 4)
        equal = runner(frame0_4, xs_4, keys4,
                       np.array([0, 1, 0, 1], np.int32))  # G == counts

        feats3 = {k: v[:3] for k, v in feats4.items()}
        frame0_3, xs_3 = rts.stack_stream_inputs(feats3)
        unequal = runner(frame0_3, xs_3, keys4[:3],
                         np.array([0, 1, 0], np.int32))   # G=2 > count(1)

        for k in ("trans_pos", "ik_pos", "cm_pos", "nn_index"):
            np.testing.assert_allclose(
                np.asarray(unequal[k]), np.asarray(equal[k])[:, :3],
                atol=1e-5, rtol=1e-4, err_msg=k)

    def test_multi_character_dropped_cnt_matches_carried(self, setup):
        """The dropped-cnt stream form must also hold under
        multi_character (the grouped matcher runs inside the chunked
        fori_loop recompute) — the 30-style-roster serving config is
        dropped-cnt + stacked databases."""
        s = setup
        bf = s["src_feats"]
        cnt_mean = bf["cnt"].mean(axis=0)
        cnt_std = bf["cnt"].std(axis=0) + 1e-6
        flat = ((bf["cnt"] - cnt_mean) / cnt_std).reshape(len(bf["cnt"]), -1)
        consts_b = s["consts"]._replace(
            cha_encoded=jnp.asarray(bf["encoded"]),
            cha_cnt_flat=jnp.asarray(flat),
            cha_cnt_sq=jnp.asarray((flat ** 2).sum(-1)),
            cnt_mean=jnp.asarray(cnt_mean), cnt_std=jnp.asarray(cnt_std),
            src_cnt_mean=jnp.asarray(cnt_mean),
            src_cnt_std=jnp.asarray(cnt_std),
            cha_encoded_mean=jnp.asarray(bf["encoded"].mean(axis=0)),
            cha_encoded_std=jnp.asarray(bf["encoded"].std(axis=0) + 1e-6))
        runner = rts.make_batch_runner(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            rts.stack_consts([s["consts"], consts_b]), s["parents"],
            deterministic=True, multi_character=True)

        feats = {k: np.stack([np.asarray(s["src_feats"][k])] * 3)
                 for k in LiveCharacterizer.FEAT_KEYS}
        cids = np.array([0, 1, 0], np.int32)
        keys = jnp.stack([jax.random.PRNGKey(3)] * 3)
        frame0, xs = rts.stack_stream_inputs(feats)
        a = jax.tree.map(np.asarray, runner(frame0, xs, keys, cids))
        feats_nc = {k: v for k, v in feats.items() if k != "cnt"}
        f0b, xsb = rts.stack_stream_inputs(feats_nc)
        b = jax.tree.map(np.asarray, runner(f0b, xsb, keys, cids))
        np.testing.assert_array_equal(a["nn_index"], b["nn_index"])
        for k in ("trans_pos", "ik_pos", "cm_pos"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)

    def test_grouped_matcher_equals_masked_form(self):
        """nn_index_grouped (the near-C-independent grouped einsum) must
        agree with the masked full-stack argmin on random data, including
        +inf database pad rows, an interleaved group assignment, and a
        SKEWED distribution that pads the query blocks (G > min count)."""
        from mocha_sigasia2023_tpu.runtime.matching import nn_index_grouped
        r = np.random.RandomState(11)
        C, M, D, T = 3, 17, 31, 5
        db = r.randn(C, M, D).astype(np.float32)
        sq = (db ** 2).sum(-1)
        sq[:, -3:] = np.inf  # padded rows can never win
        db[:, -3:] = 0.0
        for gids in (np.array([2, 0, 1, 0, 2, 1], np.int32),   # even, G=2
                     np.array([1, 1, 0, 1, 1, 2], np.int32)):  # skewed, G=4
            S = len(gids)
            G = int(np.bincount(gids, minlength=C).max())
            q = r.randn(T, S, D).astype(np.float32)

            got = np.asarray(nn_index_grouped(
                jnp.asarray(q), jnp.asarray(db), jnp.asarray(sq),
                jnp.asarray(gids), G))

            db_flat = db.reshape(C * M, D)
            row_char = np.arange(C * M) // M
            for t in range(T):
                for si in range(S):
                    d2 = sq.reshape(-1) - 2.0 * (db_flat @ q[t, si])
                    d2 = np.where(row_char == gids[si], d2, np.inf)
                    assert got[t, si] == int(np.argmin(d2)), (t, si)


class TestBf16Fidelity:
    def test_bf16_positions_within_2e3_of_f32(self, setup):
        """The bf16 serving mode (matmuls bf16, pose math f32) must track
        the f32 path within 2e-3 m positions across the whole clip — the
        0.5-blend decays per-frame matmul noise instead of accumulating
        it.  (Measured ~1e-4 on this random-init oracle; trained weights
        have larger activations, hence the looser pinned bound.)"""
        s = setup
        a = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            key=jax.random.PRNGKey(5))
        bf_params = jax.tree.map(
            lambda t: t.astype(jnp.bfloat16), s["params"])
        bf_cvae = jax.tree.map(
            lambda t: t.astype(jnp.bfloat16), s["cvae_params"])
        b = rts.characterize_clip(
            bf_params, s["cfg"], bf_cvae, s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            compute_dtype=jnp.bfloat16, key=jax.random.PRNGKey(5))
        for k in ("trans_pos", "ik_pos", "cm_pos"):
            err = float(np.abs(a[k] - b[k]).max())
            assert err <= 2e-3, f"{k}: bf16 drift {err:.2e} > 2e-3"
        # near-tie database rows may swap under bf16 scores; wholesale
        # disagreement would mean the argmin is broken
        assert float((a["nn_index"] == b["nn_index"]).mean()) > 0.9

    def test_bf16_cvae_only_within_full_bf16_bound(self, setup):
        """cvae_dtype=bfloat16 (bench --bf16-cvae: bf16 ONLY the CVAE
        sample — the step's hot op; decodes, NN match, and pose math stay
        f32) must track the f32 path within the same 2e-3 bound as full
        bf16, and the f32 NN match must be bit-identical."""
        s = setup
        a = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            key=jax.random.PRNGKey(5))
        bf_cvae = jax.tree.map(
            lambda t: t.astype(jnp.bfloat16), s["cvae_params"])
        b = rts.characterize_clip(
            s["params"], s["cfg"], bf_cvae, s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            cvae_dtype=jnp.bfloat16, key=jax.random.PRNGKey(5))
        for k in ("trans_pos", "ik_pos", "cm_pos"):
            err = float(np.abs(a[k] - b[k]).max())
            assert err <= 2e-3, f"{k}: bf16-cvae drift {err:.2e} > 2e-3"
        np.testing.assert_array_equal(a["nn_index"], b["nn_index"])


class TestLiveSession:
    def test_live_matches_offline_scan(self, setup):
        """Frame-at-a-time sessions must reproduce the offline scan."""
        from mocha_sigasia2023_tpu.runtime.live import LiveCharacterizer

        s = setup
        offline = rts.characterize_clip(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], s["src_feats"], deterministic=True,
            key=jax.random.PRNGKey(9))
        live = LiveCharacterizer(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], deterministic=True,
            key=jax.random.PRNGKey(9))
        N = len(s["src_feats"]["encoded"])
        for i in range(min(N, 12)):
            frame = {k: np.asarray(s["src_feats"][k])[i]
                     for k in LiveCharacterizer.FEAT_KEYS}
            out = live.push_frame(frame)
            np.testing.assert_allclose(
                out["ik_pos"], offline["ik_pos"][i], atol=1e-5, rtol=1e-4,
                err_msg=f"frame {i}")
            np.testing.assert_allclose(
                out["trans_pos"], offline["trans_pos"][i], atol=1e-5,
                rtol=1e-4)
        live.reset()
        out0 = live.push_frame({k: np.asarray(s["src_feats"][k])[0]
                                for k in LiveCharacterizer.FEAT_KEYS})
        np.testing.assert_allclose(out0["ik_pos"], offline["ik_pos"][0],
                                   atol=1e-5, rtol=1e-4)

    def test_pipelined_session_lags_one_frame(self, setup):
        """push_frame_pipelined returns frame i-1's pose on call i (None
        first), flush() drains the tail; values identical to push_frame."""
        from mocha_sigasia2023_tpu.runtime.live import LiveCharacterizer

        s = setup
        live = LiveCharacterizer(
            s["params"], s["cfg"], s["cvae_params"], s["cvae_cfg"],
            s["consts"], s["parents"], deterministic=True,
            key=jax.random.PRNGKey(9))
        frames = [{k: np.asarray(s["src_feats"][k])[i]
                   for k in LiveCharacterizer.FEAT_KEYS} for i in range(6)]
        direct = [live.push_frame(f) for f in frames]
        live.reset()
        piped = [live.push_frame_pipelined(f) for f in frames]
        assert piped[0] is None
        piped = piped[1:] + [live.flush()]
        for i, (a, b) in enumerate(zip(direct, piped)):
            np.testing.assert_allclose(a["ik_pos"], b["ik_pos"],
                                       atol=1e-6, err_msg=f"frame {i}")
            np.testing.assert_allclose(a["trans_pos"], b["trans_pos"],
                                       atol=1e-6)
        assert live.flush() is None
