"""End-to-end CLI chain on the CPU mesh with a tiny model config:
database build -> generator training -> feature exports -> CVAE training ->
characterization -> BVH out.  The reference workflow (README steps), in CI.
"""

import os

import numpy as np
import pytest
import yaml

from helpers import make_mocha_bvh_data

from mocha_sigasia2023_tpu.io import bvh as jbvh
from mocha_sigasia2023_tpu.cli import (
    characterize as cli_char,
    collect_features as cli_feat,
    generate_database as cli_db,
    train as cli_train,
    train_cvae as cli_cvae,
)

TINY_MODEL = {
    "mot_in_dim": 15, "nframes": 60, "njoints": 24, "nbody": 6,
    "temporal_patch_size": 4,
    "encoder_dim": 32, "encoder_depth": 1, "encoder_heads": 2,
    "encoder_dim_head": 16, "encoder_mlp_dim": 64,
    "decoder_dim": 32, "decoder_depth": 1, "decoder_heads": 2,
    "decoder_dim_head": 16, "decoder_mlp_dim": 64,
    "prj_dim": 32, "num_patches": -1,
    "graph": {
        "joint": {"layout": "mocha", "strategy": "distance", "max_hop": 2},
        "bodypart": {"layout": "mocha", "strategy": "distance", "max_hop": 1},
    },
}


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_e2e")
    bdir = d / "bvh"
    bdir.mkdir()
    jbvh.save(str(bdir / "Walk_Neutral_AverageJoe_001.bvh"),
              make_mocha_bvh_data(T=180, seed=1))
    jbvh.save(str(bdir / "Walk_Neutral_Princess_002.bvh"),
              make_mocha_bvh_data(T=200, seed=2, walk_speed=60.0))

    config = {
        "name": "model_tiny",
        "data_dir": str(d / "datasets" / "mocha60"),
        "dataset": {"mocha": {"parents": [
            -1, 0, 1, 2, 3, 0, 5, 6, 7, 8, 9, 10, 11, 8, 13, 14, 8, 16, 17,
            18, 0, 20, 21, 22]}},
        "model": TINY_MODEL,
        "manualSeed": 1777, "max_epochs": 1, "batch_size": 4,
        "lr_gen": 1e-4, "weight_decay_gen": 1e-4, "lr_drop": 100,
        "rec_w": 1, "nce_w": 0.1, "cyc_w": 1,
        "log_every": 1, "save_every": 1,
        "cvae": {"latent_dim": 32, "depth": 1, "nheads": 2,
                 "feedforward_dim": 64, "rollout_steps": 4,
                 "batch_size": 4},
        "runtime": {"window": 60, "contact_bones": [5, 24],
                    "dt": 1.0 / 60.0, "ik": {"enabled": True}},
    }
    cfg_path = d / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    return {"dir": d, "config": str(cfg_path)}


@pytest.mark.order(1)
class TestCLIChain:
    def test_1_generate_database(self, workdir):
        d = workdir["dir"]
        cli_db.main(["--bvh-dir", str(d / "bvh"),
                     "--out", str(d / "datasets" / "mocha60")])
        assert (d / "datasets" / "mocha60" / "database.bin").exists()

    def test_2_train(self, workdir, monkeypatch):
        d = workdir["dir"]
        monkeypatch.chdir(d)
        cli_train.main(["--config", workdir["config"]])
        assert (d / "model_tiny" / "pth" / "gen_001.msgpack").exists()
        assert (d / "datasets" / "mocha60" / "norm.npz").exists()
        # artifact contract: network repr + param counts dumped at train
        # start (reference train.py:58-60)
        info = (d / "model_tiny" / "info" / "info-network").read_text()
        assert "Generator" in info and "total parameters:" in info

    def test_3_collect_features(self, workdir, monkeypatch):
        d = workdir["dir"]
        monkeypatch.chdir(d)
        gen = str(d / "model_tiny" / "pth" / "gen_001.msgpack")
        data = str(d / "datasets" / "mocha60")
        cli_feat.main(["cnt-norm", "--config", workdir["config"],
                       "--data-dir", data, "--gen-ckpt", gen])
        assert (d / "datasets" / "mocha60" / "cnt_norm.npz").exists()
        cli_feat.main(["character", "--config", workdir["config"],
                       "--data-dir", data, "--gen-ckpt", gen,
                       "--styles", "2", "--actions", "7",
                       "--out", str(d / "src_feature.npz")])
        cli_feat.main(["character", "--config", workdir["config"],
                       "--data-dir", data, "--gen-ckpt", gen,
                       "--styles", "17", "--actions", "7",
                       "--out", str(d / "cha_feature.npz")])
        feats = dict(np.load(str(d / "cha_feature.npz")))
        assert feats["encoded"].shape[1:] == (90, 32)

    def test_4_train_cvae(self, workdir, monkeypatch):
        d = workdir["dir"]
        monkeypatch.chdir(d)
        cli_cvae.main(["--config", workdir["config"],
                       "--src-features", str(d / "src_feature.npz"),
                       "--cha-features", str(d / "cha_feature.npz"),
                       "--cnt-norm", str(d / "datasets/mocha60/cnt_norm.npz"),
                       "--out", str(d / "cvae"),
                       "--num-iters", "3", "--batch-size", "4"])
        assert (d / "cvae" / "cvae_000003.msgpack").exists()
        assert (d / "cvae" / "cvae_norm.npz").exists()

    def test_5_characterize(self, workdir, monkeypatch):
        d = workdir["dir"]
        monkeypatch.chdir(d)
        out = cli_char.main([
            "--config", workdir["config"],
            "--src", str(d / "bvh" / "Walk_Neutral_AverageJoe_001.bvh"),
            "--cha", str(d / "bvh" / "Walk_Neutral_Princess_002.bvh"),
            "--gen-ckpt", str(d / "model_tiny" / "pth" / "gen_001.msgpack"),
            "--cvae-ckpt", str(d / "cvae" / "cvae_000003.msgpack"),
            "--cvae-norm", str(d / "cvae" / "cvae_norm.npz"),
            "--norm", str(d / "datasets" / "mocha60" / "norm.npz"),
            "--cnt-norm", str(d / "datasets" / "mocha60" / "cnt_norm.npz"),
            "--out", str(d / "results"), "--deterministic",
            "--viz", str(d / "results" / "anim.gif")])
        files = os.listdir(d / "results")
        assert any(f.startswith("Ours_") for f in files)
        assert any(f.startswith("Src_") for f in files)
        # --viz renders the 4-stream comparison to file (Agg backend)
        assert (d / "results" / "anim.gif").stat().st_size > 0
        loaded = jbvh.load(str(
            d / "results" / sorted(f for f in files if f.endswith(".bvh"))[-1]))
        assert np.isfinite(loaded["rotations"]).all()
        assert np.all(np.isfinite(out["ik_pos"]))

    def test_6_characterize_batch_dir(self, workdir, monkeypatch):
        """--src-dir runs every clip as a parallel stream of ONE scanned
        program (the throughput path) and trims outputs per clip."""
        d = workdir["dir"]
        monkeypatch.chdir(d)
        cli_char.main([
            "--config", workdir["config"],
            "--src-dir", str(d / "bvh"),
            "--cha", str(d / "bvh" / "Walk_Neutral_Princess_002.bvh"),
            "--gen-ckpt", str(d / "model_tiny" / "pth" / "gen_001.msgpack"),
            "--norm", str(d / "datasets" / "mocha60" / "norm.npz"),
            "--cnt-norm", str(d / "datasets" / "mocha60" / "cnt_norm.npz"),
            "--out", str(d / "results_batch"), "--deterministic",
            "--random-init"])
        ours = sorted(f for f in os.listdir(d / "results_batch")
                      if f.startswith("Ours_"))
        assert len(ours) == 2
        # clips have different lengths (180 vs 200 frames raw) — outputs
        # must be trimmed per clip, not padded to the longest
        n_frames = [jbvh.load(str(d / "results_batch" / f))["rotations"].shape[0]
                    for f in ours]
        assert n_frames[0] != n_frames[1]

    def test_7_characterize_batch_dir_tchunk(self, workdir, monkeypatch):
        """--tchunk routes the batch through runner.chunked (host-resident
        inputs streamed to the device in bounded time chunks); outputs
        must match the monolithic --src-dir run byte-for-byte."""
        d = workdir["dir"]
        monkeypatch.chdir(d)
        cli_char.main([
            "--config", workdir["config"],
            "--src-dir", str(d / "bvh"),
            "--cha", str(d / "bvh" / "Walk_Neutral_Princess_002.bvh"),
            "--gen-ckpt", str(d / "model_tiny" / "pth" / "gen_001.msgpack"),
            "--norm", str(d / "datasets" / "mocha60" / "norm.npz"),
            "--cnt-norm", str(d / "datasets" / "mocha60" / "cnt_norm.npz"),
            "--out", str(d / "results_tchunk"), "--deterministic",
            "--random-init", "--tchunk", "16"])
        mono = sorted(os.listdir(d / "results_batch"))
        chunked = sorted(os.listdir(d / "results_tchunk"))
        assert mono == chunked
        for f in mono:
            a = jbvh.load(str(d / "results_batch" / f))
            b = jbvh.load(str(d / "results_tchunk" / f))
            np.testing.assert_allclose(b["rotations"], a["rotations"],
                                       atol=1e-4, err_msg=f)
            np.testing.assert_allclose(b["positions"], a["positions"],
                                       atol=1e-4, err_msg=f)
