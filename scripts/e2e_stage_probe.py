#!/usr/bin/env python
"""Stage split of the end-to-end pipeline: featurize+encode dispatch vs
stream scan, timed separately with a host-sync between (bench.py --e2e
times them back-to-back as production runs them).

Also ablates the featurize+encode program itself: full program vs
encoder-matmuls-skipped (returns the raw X-derived features with zero
encode) to separate window-gather/FK bandwidth cost from encoder MXU cost.

Usage: python scripts/e2e_stage_probe.py [--streams 64] [--frames 240]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--db-size", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    from mocha_sigasia2023_tpu.cli.characterize import build_consts
    from mocha_sigasia2023_tpu.data.synthetic import make_mocha_bvh_data
    from mocha_sigasia2023_tpu.models import CVAEConfig, GeneratorConfig
    from mocha_sigasia2023_tpu.models.cvae import init_cvae
    from mocha_sigasia2023_tpu.models.generator import init_generator
    from mocha_sigasia2023_tpu.runtime import features as rtf
    from mocha_sigasia2023_tpu.runtime.stream import (
        IKConfig, make_batch_runner,
    )
    from mocha_sigasia2023_tpu.data import preprocess as pre
    from mocha_sigasia2023_tpu.data.dataset import (
        compute_norm_stats, window_xy_features,
    )
    from mocha_sigasia2023_tpu.data.windows import window_features
    from mocha_sigasia2023_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = GeneratorConfig()
    cvae_cfg = CVAEConfig(output_seq=cfg.num_tokens)
    key = jax.random.PRNGKey(0)
    params = init_generator(key, cfg)
    cvae_params = init_cvae(jax.random.fold_in(key, 1), cvae_cfg)

    S, F = args.streams, args.frames
    win = 60
    pad = win // 4
    cha_clip = make_mocha_bvh_data(T=args.db_size + pad, seed=10_000,
                                   walk_speed=60.0)
    src_clips = [make_mocha_bvh_data(T=F + pad, seed=i) for i in range(S)]

    feats0 = pre.featurize_clip_jit(cha_clip)
    w = window_features(feats0, win, 10, padded=False)
    X, Y, root = window_xy_features(
        w["rotations"], w["positions"], w["velocities"],
        w["angular_velocities"], feats0["bone_parents"])
    norm = compute_norm_stats(np.asarray(X), np.asarray(Y), np.asarray(root))

    cha_feats = rtf.clip_stream_features_device(cha_clip, params, cfg, norm)
    cha_feats = {k: (np.asarray(v) if k != "bone_names" else v)
                 for k, v in cha_feats.items()}
    cnt_norm = rtf.compute_cnt_norm(cha_feats["encoded"], cha_feats["cnt"])
    consts = build_consts(norm, cnt_norm, None, cha_feats)
    parents = cha_feats["bone_parents"]

    runner = make_batch_runner(params, cfg, cvae_params, cvae_cfg, consts,
                               parents, ik=IKConfig(enabled=True))
    keys = jax.random.split(jax.random.PRNGKey(7), S)

    src_rot = [np.asarray(c["rotations"], np.float32) for c in src_clips]
    src_pos = [np.asarray(c["positions"], np.float32) for c in src_clips]
    clips = [{"rotations": r, "positions": p,
              "order": src_clips[0]["order"],
              "names": src_clips[0]["names"],
              "parents": src_clips[0]["parents"]}
             for r, p in zip(src_rot, src_pos)]

    def sync(tree):
        leaves = jax.tree.leaves(tree)
        np.asarray(leaves[0].reshape(-1)[:1])

    def t_featurize():
        t0 = time.perf_counter()
        frame0, xs = rtf.batch_stream_features_device(
            clips, params, cfg, norm)
        sync(xs)
        return time.perf_counter() - t0, (frame0, xs)

    def t_scan(frame0, xs, ks):
        t0 = time.perf_counter()
        out = runner(frame0, xs, ks)
        np.asarray(out["nn_index"])
        return time.perf_counter() - t0

    # warm both programs
    for _ in range(2):
        _, (frame0, xs) = t_featurize()
        t_scan(frame0, xs, keys)

    feat_ts, scan_ts = [], []
    for r in range(args.repeats):
        ks = jax.random.split(jax.random.PRNGKey(100 + r), S)
        ft, (frame0, xs) = t_featurize()
        st = t_scan(frame0, xs, ks)
        feat_ts.append(ft)
        scan_ts.append(st)

    n = S * F
    ft, st = min(feat_ts), min(scan_ts)
    print(f"streams={S} frames={F} total_frames={n}")
    print(f"featurize+encode: {ft*1e3:8.1f} ms  ({n/ft:9.0f} frames/s alone)")
    print(f"stream scan:      {st*1e3:8.1f} ms  ({n/st:9.0f} frames/s alone)")
    print(f"serial e2e:       {(ft+st)*1e3:8.1f} ms  ({n/(ft+st):9.0f} "
          "frames/s)")
    print(f"featurize share:  {ft/(ft+st)*100:5.1f}%")


if __name__ == "__main__":
    main()
