#!/usr/bin/env python
"""Real training-convergence artifact: does the JAX trainer actually LEARN?

The torch-trajectory parity tests prove 3 steps of identical dynamics
(tests/test_train.py); this script proves the other half — that a few
hundred optimizer steps at reference scale drive the losses down and the
trained EMA weights characterize a clip to finite poses.  It runs the
SHIPPED CLI chain end-to-end on a synthetic mocha-rig dataset (the real
bvh/ corpus is download-only, /root/reference/download.sh):

    synth BVH -> cli.generate_database -> cli.train (generator, N steps)
      -> cli.collect_features (cnt-norm + per-character features)
      -> cli.train_cvae (M iters) -> cli.characterize (trained weights)

Loss curves land in <workdir>/model_conv/log/train/metrics.jsonl and
<workdir>/cvae/log/metrics.jsonl (MetricsLogger JSONL, same scalar names
as the reference's TensorBoard stream: trainer.py:159-165,
train_CVAE.py:272-276).  Prints one summary JSON line at the end.

Usage: python scripts/train_convergence.py [--gen-steps 300]
           [--cvae-iters 600] [--workdir /tmp/mocha_convergence]
"""
import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_jsonl_series(path, tag):
    """MetricsLogger JSONL: one {"tag", "value", "step"} record per line.

    MetricsLogger APPENDS, so a rerun with ``--keep`` leaves earlier runs'
    records in the same file — keep only the FINAL monotonic step range
    (reset the series whenever the step counter restarts) so first/last
    convergence means never mix runs."""
    vals = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == tag:
                step = rec.get("step", len(vals))
                if vals and step < vals[-1][0]:
                    vals = []  # step counter restarted -> a newer run
                vals.append((step, rec["value"]))
    return vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen-steps", type=int, default=300,
                    help="approximate generator optimizer steps")
    ap.add_argument("--cvae-iters", type=int, default=600)
    ap.add_argument("--clips", type=int, default=6,
                    help="synthetic clips per style (x2 styles, x2 mirror)")
    ap.add_argument("--frames", type=int, default=480,
                    help="frames per synthetic clip")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--workdir", default="/tmp/mocha_convergence")
    ap.add_argument("--keep", action="store_true",
                    help="keep an existing workdir's database/checkpoints")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "overrides JAX_PLATFORMS; same treatment as "
                         "tests/conftest.py) — for smoke runs off-chip")
    ap.add_argument("--through", choices=["gen", "full"], default="full",
                    help="stage gate: 'gen' stops after generator training "
                    "(prints a partial summary).  The axon relay client "
                    "retains host mirrors of device buffers (~170 MB/CVAE "
                    "iteration observed), so on small-RAM hosts run the "
                    "script twice in fresh processes: --through gen, then "
                    "--keep for the CVAE/characterize stages")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from mocha_sigasia2023_tpu.io import bvh as jbvh
    from mocha_sigasia2023_tpu.data.synthetic import make_mocha_bvh_data
    from mocha_sigasia2023_tpu.cli import (
        characterize as cli_char,
        collect_features as cli_feat,
        generate_database as cli_db,
        train as cli_train,
        train_cvae as cli_cvae,
    )
    from mocha_sigasia2023_tpu.cli.characterize import DEFAULT_CONFIG
    from mocha_sigasia2023_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    d = args.workdir
    if not args.keep and os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(os.path.join(d, "bvh"), exist_ok=True)
    os.chdir(d)

    # --- 1. synthetic corpus: two styles (the demo pair), Walk action ----
    styles = ["Neutral_AverageJoe", "Neutral_Princess"]
    paths = {s: [] for s in styles}
    for si, style in enumerate(styles):
        for c in range(args.clips):
            p = os.path.join(d, "bvh", f"Walk_{style}_{c:03d}.bvh")
            if not os.path.exists(p):
                jbvh.save(p, make_mocha_bvh_data(
                    T=args.frames, seed=100 * si + c,
                    walk_speed=60.0 + 15.0 * si + 4.0 * c))
            paths[style].append(p)

    data_dir = os.path.join(d, "datasets", "mocha60")
    if not os.path.exists(os.path.join(data_dir, "database.bin")):
        cli_db.main(["--bvh-dir", os.path.join(d, "bvh"), "--out", data_dir])

    # --- 2. config: reference scale, epochs sized to ~gen-steps ---------
    with open(DEFAULT_CONFIG) as f:
        config = yaml.safe_load(f)
    # windows per epoch: clips x 2 styles x 2 (mirror) x ((T-60)/20+1)
    n_windows = 2 * 2 * args.clips * ((args.frames - 60) // 20 + 1)
    steps_per_epoch = max(n_windows // args.batch_size, 1)
    epochs = max(args.gen_steps // steps_per_epoch, 1)
    config.update({
        "name": "model_conv", "data_dir": data_dir,
        "max_epochs": epochs, "batch_size": args.batch_size,
        "save_every": epochs, "log_every": 1,
    })
    cfg_path = os.path.join(d, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    gen_ckpt = os.path.join(d, "model_conv", "pth",
                            f"gen_{epochs:03d}.msgpack")
    t0 = time.time()
    if not os.path.exists(gen_ckpt):
        cli_train.main(["--config", cfg_path])
    t_gen = time.time() - t0

    gen_series = read_jsonl_series(
        os.path.join(d, "model_conv", "log", "train", "metrics.jsonl"),
        "gen/loss_total")
    # first/last as the mean over a few log points to de-noise batch draw
    k = min(5, len(gen_series))
    gen_first = float(np.mean([v for _, v in gen_series[:k]]))
    gen_last = float(np.mean([v for _, v in gen_series[-k:]]))

    if args.through == "gen":
        summary = {
            "stage": "gen",
            "gen_steps": epochs * steps_per_epoch,
            "gen_loss_total_first": round(gen_first, 3),
            "gen_loss_total_last": round(gen_last, 3),
            "gen_train_s": round(t_gen, 1),
            "workdir": d,
        }
        print(json.dumps(summary))
        ok = gen_last < gen_first and np.isfinite(gen_last)
        print("GEN STAGE:", "OK" if ok else "NOT CONVERGED")
        return 0 if ok else 1

    # --- 3. feature exports with the trained generator -------------------
    cnt_norm = os.path.join(data_dir, "cnt_norm.npz")
    cli_feat.main(["cnt-norm", "--config", cfg_path,
                   "--data-dir", data_dir, "--gen-ckpt", gen_ckpt])
    src_feat = os.path.join(d, "src_feature.npz")
    cha_feat = os.path.join(d, "cha_feature.npz")
    cli_feat.main(["character", "--config", cfg_path, "--data-dir", data_dir,
                   "--gen-ckpt", gen_ckpt, "--styles", "2", "--actions", "7",
                   "--out", src_feat])
    cli_feat.main(["character", "--config", cfg_path, "--data-dir", data_dir,
                   "--gen-ckpt", gen_ckpt, "--styles", "17", "--actions", "7",
                   "--out", cha_feat])

    # --- 4. CVAE training -------------------------------------------------
    t0 = time.time()
    cli_cvae.main(["--config", cfg_path,
                   "--src-features", src_feat, "--cha-features", cha_feat,
                   "--cnt-norm", cnt_norm, "--out", os.path.join(d, "cvae"),
                   "--num-iters", str(args.cvae_iters),
                   "--target-actions", "7"])  # the corpus is Walk-only
    t_cvae = time.time() - t0
    cvae_ckpt = os.path.join(d, "cvae",
                             f"cvae_{args.cvae_iters:06d}.msgpack")
    cvae_series = read_jsonl_series(
        os.path.join(d, "cvae", "log", "metrics.jsonl"),
        "cvae/encoded_loss")
    k = min(5, len(cvae_series))
    cvae_first = float(np.mean([v for _, v in cvae_series[:k]]))
    cvae_last = float(np.mean([v for _, v in cvae_series[-k:]]))

    # --- 5. characterize the demo pair with the TRAINED weights ----------
    out = cli_char.main([
        "--config", cfg_path,
        "--src", paths["Neutral_AverageJoe"][0],
        "--cha", paths["Neutral_Princess"][0],
        "--gen-ckpt", gen_ckpt, "--cvae-ckpt", cvae_ckpt,
        "--cvae-norm", os.path.join(d, "cvae", "cvae_norm.npz"),
        "--norm", os.path.join(data_dir, "norm.npz"),
        "--cnt-norm", cnt_norm,
        "--out", os.path.join(d, "results"), "--deterministic"])
    finite = bool(np.all(np.isfinite(out["ik_pos"])))

    summary = {
        "gen_steps": epochs * steps_per_epoch,
        "gen_loss_total_first": round(gen_first, 3),
        "gen_loss_total_last": round(gen_last, 3),
        "gen_train_s": round(t_gen, 1),
        "cvae_iters": args.cvae_iters,
        "cvae_encoded_loss_first": round(cvae_first, 4),
        "cvae_encoded_loss_last": round(cvae_last, 4),
        "cvae_train_s": round(t_cvae, 1),
        "characterize_finite": finite,
        "workdir": d,
    }
    print(json.dumps(summary))
    ok = (gen_last < gen_first and cvae_last < cvae_first and finite)
    print("CONVERGENCE:", "OK" if ok else "NOT CONVERGED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
