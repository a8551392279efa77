#!/usr/bin/env python
"""Stage split of the end-to-end pipeline: featurize+encode dispatch vs
stream scan, timed separately with a host-sync between (bench.py --e2e
times them back-to-back as production runs them).

Also ablates the featurize+encode program itself: full program vs
encoder-matmuls-skipped (skip_encode=True replaces the encoder with a
trivial reduce that still consumes the normalized X windows) to separate
window-gather/FK bandwidth cost from encoder MXU cost, and reports each
program's XLA cost-analysis FLOPs/bytes with the achieved TFLOP/s and
HBM GB/s they imply.

Usage: python scripts/e2e_stage_probe.py [--streams 64] [--frames 240]
           [--chunk 256] [--carry-cnt]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aot_cost(jitted_cached_fn, *args):
    """flops / bytes accessed from XLA's own cost model for a jitted fn."""
    try:
        c = jitted_cached_fn.lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0)), float(
            c.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"  (cost analysis unavailable: {e})")
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--db-size", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=256,
                    help="encoder windows per lax.map step in the "
                         "featurize program")
    ap.add_argument("--carry-cnt", action="store_true",
                    help="emit + stream the redundant cnt array "
                         "(the pre-r4 form)")
    ap.add_argument("--cost-model", action="store_true",
                    help="loop-corrected XLA cost model for the featurize "
                         "stage: lower the program at two chunk sizes to "
                         "solve for the per-window body cost (the naive "
                         "cost_analysis counts a lax.map body once)")
    ap.add_argument("--ablate", action="store_true",
                    help="decompose the featurize+encode stage further: "
                         "per-frame featurize+FK alone, +window gather, "
                         "+X-derive quat math (cumulative jitted "
                         "programs, each ending in a tiny reduce so XLA "
                         "can't dead-code the stage under test)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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
    emit_cnt = bool(args.carry_cnt)

    def sync(tree):
        leaves = jax.tree.leaves(tree)
        np.asarray(leaves[0].reshape(-1)[:1])

    def t_featurize(skip_encode=False):
        t0 = time.perf_counter()
        frame0, xs = rtf.batch_stream_features_device(
            clips, params, cfg, norm, chunk=args.chunk, emit_cnt=emit_cnt,
            skip_encode=skip_encode)
        sync(xs)
        return time.perf_counter() - t0, (frame0, xs)

    def t_scan(frame0, xs, ks):
        t0 = time.perf_counter()
        out = runner(frame0, xs, ks)
        np.asarray(out["nn_index"])
        return time.perf_counter() - t0

    # warm all three programs
    for _ in range(2):
        _, (frame0, xs) = t_featurize()
        t_featurize(skip_encode=True)
        t_scan(frame0, xs, keys)

    feat_ts, skip_ts, scan_ts = [], [], []
    for r in range(args.repeats):
        ks = jax.random.split(jax.random.PRNGKey(100 + r), S)
        ft, (frame0, xs) = t_featurize()
        sk, _ = t_featurize(skip_encode=True)
        st = t_scan(frame0, xs, ks)
        feat_ts.append(ft)
        skip_ts.append(sk)
        scan_ts.append(st)

    # ---- XLA's own cost model for the two programs ----------------------
    c0 = clips[0]
    feat_fn = rtf._batch_stream_featurizer_jitted(
        cfg, len(clips), np.asarray(c0["rotations"]).shape[0], c0["order"],
        tuple(c0["names"]), tuple(int(p) for p in c0["parents"]), win, 0.5,
        60.0, int(args.chunk), None, emit_cnt, False)
    rot = jnp.asarray(np.stack(src_rot))
    pos = jnp.asarray(np.stack(src_pos))
    feat_flops, feat_bytes = aot_cost(
        feat_fn, params, jnp.asarray(norm["X_mean"], jnp.float32),
        jnp.asarray(norm["X_std"], jnp.float32), rot, pos)
    scan_flops, scan_bytes = aot_cost(
        runner._inner, *runner._ctx, frame0, xs, keys, None)

    n = S * F
    ft, sk, st = min(feat_ts), min(skip_ts), min(scan_ts)
    print(f"streams={S} frames={F} total_frames={n} chunk={args.chunk} "
          f"emit_cnt={emit_cnt}")
    print(f"featurize+encode: {ft*1e3:8.1f} ms  ({n/ft:9.0f} frames/s alone)")
    print(f"  encode-skipped: {sk*1e3:8.1f} ms  ({n/sk:9.0f} frames/s) -> "
          f"encoder matmuls ~{(ft-sk)*1e3:.1f} ms "
          f"({(ft-sk)/ft*100:.0f}% of the stage)")
    if feat_flops:
        print(f"  XLA cost model: {feat_flops/1e9:.1f} GFLOP, "
              f"{feat_bytes/1e9:.2f} GB accessed -> achieved "
              f"{feat_flops/ft/1e12:.1f} TFLOP/s, {feat_bytes/ft/1e9:.0f} "
              "GB/s")
    print(f"stream scan:      {st*1e3:8.1f} ms  ({n/st:9.0f} frames/s alone)")
    if scan_flops:
        print(f"  XLA cost model: {scan_flops/1e9:.1f} GFLOP, "
              f"{scan_bytes/1e9:.2f} GB accessed -> achieved "
              f"{scan_flops/st/1e12:.1f} TFLOP/s, {scan_bytes/st/1e9:.0f} "
              "GB/s")
    print(f"serial e2e:       {(ft+st)*1e3:8.1f} ms  ({n/(ft+st):9.0f} "
          "frames/s)")
    print(f"featurize share:  {ft/(ft+st)*100:5.1f}%")

    if args.cost_model:
        # XLA's cost analysis counts a while/map-loop BODY ONCE (verified:
        # doubling scan trip count leaves reported flops ~unchanged), so
        # the naive numbers above understate looped programs.  Solve for
        # the per-window body cost instead: reported(chunk) =
        # outside + body(chunk) and body scales linearly in chunk, so two
        # chunk sizes give body-per-window = Δreported/Δchunk; true total
        # = outside + per_window * n_windows.  Done for the full and the
        # encode-skipped programs; their difference is the encoder.
        n_w_total = n  # one sliding window per frame
        # the featurizer clamps its lax.map chunk to the total window
        # count (csize = min(chunk, total)), so solve against the
        # EFFECTIVE chunk of each lowering — requesting chunk >= total
        # makes both lowerings identical and the two-point solve
        # degenerate
        c1, c2 = (min(int(args.chunk), n_w_total),
                  min(2 * int(args.chunk), n_w_total))
        if c1 == c2:
            print(f"cost model: skipped — effective chunk sizes equal "
                  f"({c1}; --chunk >= the {n_w_total}-window total), "
                  "two-point solve is degenerate; rerun with a smaller "
                  "--chunk")
            full = skip = None

        def two_point(skip):
            costs = []
            for c in (c1, c2):
                fn = rtf._batch_stream_featurizer_jitted(
                    cfg, len(clips), np.asarray(c0["rotations"]).shape[0],
                    c0["order"], tuple(c0["names"]),
                    tuple(int(p) for p in c0["parents"]), win, 0.5,
                    60.0, c, None, emit_cnt, skip)
                costs.append(aot_cost(
                    fn, params, jnp.asarray(norm["X_mean"], jnp.float32),
                    jnp.asarray(norm["X_std"], jnp.float32), rot, pos))
            (f1, b1), (f2, b2) = costs
            if f1 is None or f2 is None:
                return None
            pw_f, pw_b = (f2 - f1) / (c2 - c1), (b2 - b1) / (c2 - c1)
            out_f, out_b = f1 - pw_f * c1, b1 - pw_b * c1
            return (out_f + pw_f * n_w_total, out_b + pw_b * n_w_total,
                    pw_f, pw_b)

        if c1 != c2:
            full = two_point(False)
            skip = two_point(True)
        if full:
            tf_, tb_, pwf, _ = full
            print(f"cost model (loop-corrected, {n_w_total} windows):")
            print(f"  full stage:  {tf_/1e12:6.2f} TFLOP, {tb_/1e9:7.1f} GB"
                  f" -> achieved {tf_/ft/1e12:5.1f} TFLOP/s,"
                  f" {tb_/ft/1e9:5.0f} GB/s  ({pwf/1e9:.3f} GFLOP/window)")
        if full and skip:
            sf_, sb_, spwf, _ = skip
            ef, eb = tf_ - sf_, tb_ - sb_
            et = ft - sk
            print(f"  encode-skip: {sf_/1e12:6.2f} TFLOP, {sb_/1e9:7.1f} GB"
                  f" -> achieved {sf_/sk/1e12:5.1f} TFLOP/s,"
                  f" {sb_/sk/1e9:5.0f} GB/s  ({spwf/1e9:.3f} GFLOP/window)")
            # ft and sk are independent wall-clock minima — their
            # difference can be ~0 or negative from timing noise alone
            if et > 1e-4:
                print(f"  encoder:     {ef/1e12:6.2f} TFLOP, {eb/1e9:7.1f}"
                      f" GB -> achieved {ef/et/1e12:5.1f} TFLOP/s,"
                      f" {eb/et/1e9:5.0f} GB/s over its {et*1e3:.0f} ms")
            else:
                print(f"  encoder:     {ef/1e12:6.2f} TFLOP, {eb/1e9:7.1f}"
                      f" GB -> encoder time below wall-clock noise floor "
                      f"({et*1e3:.2f} ms); achieved rates not meaningful")

    if not args.ablate:
        return

    # ---- finer ablation of the featurize+encode stage --------------------
    # Cumulative programs, timed separately; deltas give each substage.
    from jax import lax

    from mocha_sigasia2023_tpu.data.preprocess import featurize_clip
    from mocha_sigasia2023_tpu.data.windows import padded_window_indices
    from mocha_sigasia2023_tpu.kinematics import quat
    from mocha_sigasia2023_tpu.runtime.features import (
        _BSF_KEYS, _per_frame_world,
    )

    c0 = clips[0]
    order = c0["order"]
    names = list(c0["names"])
    parents_raw = np.asarray(c0["parents"])
    bone_parents = np.concatenate([[-1], parents_raw + 1])
    nframes = np.asarray(c0["rotations"]).shape[0]
    idx, pad_m = padded_window_indices(nframes, win, 1)
    n_w = len(idx)
    flat_idx = (np.arange(S)[:, None, None] * nframes
                + idx[None]).reshape(S * n_w, win).astype(np.int32)
    flat_pad = np.broadcast_to(
        pad_m[None], (S, n_w, win)).reshape(S * n_w, win)
    total = S * n_w
    csize = min(args.chunk, total)
    G = -(-total // csize)
    pr = G * csize - total
    flat_idx = np.concatenate([flat_idx, np.repeat(flat_idx[-1:], pr, 0)])
    flat_pad = np.concatenate([flat_pad, np.repeat(flat_pad[-1:], pr, 0)])
    flat_idx = jnp.asarray(flat_idx.reshape(G, csize, win))
    flat_pad = jnp.asarray(flat_pad.reshape(G, csize, win))

    def frames_stage(rot_deg, pos_cm):
        def one_clip(r, p):
            out = featurize_clip(r, p, order, names, parents_raw,
                                 contact_velocity_threshold=0.5, fps=60.0)
            return {k: out[k] for k in _BSF_KEYS}

        feats = jax.vmap(one_clip)(rot_deg, pos_cm)
        pf = _per_frame_world(feats, bone_parents)
        return {k: v.reshape((S * nframes,) + v.shape[2:])
                for k, v in pf.items()}

    def gather_stage(pf):
        def do_chunk(c):
            ci, cp = c
            m = (~cp).astype(jnp.float32)[..., None, None]
            acc = 0.0
            for k in ("Grot", "Gpos", "Gvel", "Gang"):
                acc = acc + jnp.sum(pf[k][ci] * m, axis=(1, 2, 3))
            return acc

        return lax.map(do_chunk, (flat_idx, flat_pad))

    def xderive_stage(pf):
        def do_chunk(c):
            ci, cp = c
            m = (~cp).astype(jnp.float32)[..., None, None]
            Grot, Gpos = pf["Grot"][ci], pf["Gpos"][ci]
            Gvel, Gang = pf["Gvel"][ci] * m, pf["Gang"][ci] * m

            def pin_last(a):
                return a.at[:, :, 0:1].set(
                    jnp.repeat(a[:, -1:, 0:1], win, axis=1))

            Grot, Gpos = pin_last(Grot), pin_last(Gpos)
            Gvel, Gang = pin_last(Gvel), pin_last(Gang)
            root_rot = Grot[:, :, 0:1]
            Xpos = quat.inv_mul_vec(root_rot, Gpos - Gpos[:, :, 0:1])
            Xrot = quat.inv_mul(root_rot, Grot)
            Xvel = quat.inv_mul_vec(root_rot, Gvel)
            Xang = quat.inv_mul_vec(root_rot, Gang)
            b, t, j = Xpos.shape[:3]
            X = jnp.concatenate(
                [Xpos, quat.to_xform_xy(Xrot).reshape(b, t, j, 6),
                 Xvel, Xang], axis=-1)
            return jnp.sum(X, axis=(1, 2, 3))

        return lax.map(do_chunk, (flat_idx, flat_pad))

    rot = jnp.asarray(np.stack(src_rot))
    pos = jnp.asarray(np.stack(src_pos))
    f_frames = jax.jit(lambda r, p: jax.tree.map(
        lambda a: jnp.sum(a), frames_stage(r, p)))
    f_gather = jax.jit(lambda r, p: gather_stage(frames_stage(r, p)))
    f_xder = jax.jit(lambda r, p: xderive_stage(frames_stage(r, p)))

    def tmin(f, reps=args.repeats):
        for _ in range(2):
            sync(f(rot, pos))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(rot, pos))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tf = tmin(f_frames)
    tg = tmin(f_gather)
    tx = tmin(f_xder)
    print("\nablation (cumulative programs; encode-skipped full stage "
          f"= {sk*1e3:.1f} ms):")
    print(f"  featurize_clip+FK (per-frame):  {tf*1e3:8.1f} ms")
    print(f"  + window gather (G arrays):     {tg*1e3:8.1f} ms "
          f"(gather ≈ {(tg-tf)*1e3:.1f} ms)")
    print(f"  + X-derive quat math:           {tx*1e3:8.1f} ms "
          f"(quat math ≈ {(tx-tg)*1e3:.1f} ms)")
    print(f"  residual (Y tails + writes):    {(sk-tx)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
