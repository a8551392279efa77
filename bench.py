#!/usr/bin/env python
"""Headline benchmark: characterized frames/sec/chip, END TO END.

The default run measures the full pipeline the reference demo executes
(test_fullframework.py:124-203,438): raw clip arrays -> featurize (root
synthesis, velocities, contacts) -> sliding-window gather -> X/Y feature
derive -> batched encoder -> batched stream scan (NN context match over a
character database, CVAE sample, decoder + motion head, root integration,
foot-contact locking + two-bone IK).  It prints ONE JSON line whose
headline value is the end-to-end rate; the step-loop-only rate (the
post-encode scan, the r1/r2 headline instrument) rides along as
``step_loop_frames_per_sec``.

``--e2e`` / ``--step-loop`` run just one of the two instruments.

Baseline: the reference's implied real-time contract is 60 frames/sec per
stream (test_fullframework.py:105, dt=1/60; no published numbers —
BASELINE.md).  ``vs_baseline`` = frames/sec/chip / 60.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--db-size", type=int, default=2048)
    ap.add_argument("--characters", type=int, default=1,
                    help="serve N distinct characters round-robin across "
                         "the streams from one shared database stack "
                         "(multi_character runner)")
    ap.add_argument("--repeats", type=int, default=7,
                    help="timed repeats; the metric is the min. One e2e "
                    "repeat is ~1.1 s against ~9 min of compile/setup, so "
                    "extra repeats are ~free and stabilize the min against "
                    "relay-session hiccups (r4 captured 13.4k vs r5's 14.5k "
                    "from the same code at 3 repeats)")
    ap.add_argument("--e2e", action="store_true",
                    help="end-to-end instrument only: clip arrays -> "
                         "featurize -> window -> encode -> stream scan")
    ap.add_argument("--step-loop", action="store_true",
                    help="step-loop instrument only: the post-encode scan "
                         "over precomputed features (the r1/r2 headline)")
    ap.add_argument("--no-cvae", action="store_true")
    ap.add_argument("--single-stream", action="store_true",
                    help="production path only (skip the NN cm decode)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 decoder/CVAE matmuls, f32 pose math")
    ap.add_argument("--bf16-cvae", action="store_true",
                    help="bf16 ONLY the CVAE sample (the step's hot op, "
                         "~63%% — README ablation table); generator "
                         "decodes and pose math stay f32")
    ap.add_argument("--unroll", type=int, default=1,
                    help="lax.scan unroll factor for the frame loop")
    ap.add_argument("--fuse-decodes", action="store_true",
                    help="decode the CVAE + NN streams in one K=2 batched "
                         "decoder call instead of two separate calls")
    ap.add_argument("--lean-decode", action="store_true",
                    help="use the lean last-frame+hip-velocity stream "
                         "decode (measured 44%% slower on v5e: tiny conv "
                         "shapes tile worse than the dense head)")
    ap.add_argument("--no-ik", action="store_true",
                    help="disable the foot-contact locking + two-bone IK "
                         "fixup (ablation for the step cost model)")
    ap.add_argument("--deterministic", action="store_true",
                    help="deterministic CVAE sampling (z = prior mu, no "
                         "RNG draws; ablation for the PRNG cost)")
    ap.add_argument("--chunk", type=int, default=128,
                    help="featurizer encoder-chunk size (windows per "
                         "lax.map step); swept on v5e — 128 best "
                         "(scripts/e2e_stage_probe.py --chunk)")
    ap.add_argument("--tchunk", type=int, default=0,
                    help="step-loop: stream xs to the device in time "
                         "chunks of this many frames (runner.chunked) "
                         "instead of one monolithic upload — bounds HBM "
                         "residency to ~2 chunks; 0 = monolithic. The "
                         "S=256 row runs with --tchunk 60")
    ap.add_argument("--carry-cnt", action="store_true",
                    help="carry the redundant per-frame cnt array through "
                         "the stream scan (the pre-r4 form; cnt is exactly "
                         "mean_variance_norm(encoded), so the default "
                         "re-derives it on demand — halves per-frame "
                         "stream inputs, unblocks --streams 256)")
    ap.add_argument("--measure-retrace", action="store_true",
                    help="with --characters N: time the one-off "
                         "trace+compile a NEW character distribution "
                         "(different grouped-matcher group_size) costs "
                         "before the steady-state measurement")
    ap.add_argument("--db-bf16", action="store_true",
                    help="store the character database stack (encoded rows "
                         "+ cnt matrix) in bf16 — halves its HBM, fits the "
                         "30-style roster at 2048 rows/character")
    ap.add_argument("--rbg-prng", action="store_true",
                    help="use the counter-based rbg PRNG for the CVAE "
                         "noise (measured 21%% SLOWER than threefry on "
                         "v5e; threefry itself is free — --deterministic "
                         "matches the default within noise)")
    ap.add_argument("--latency", action="store_true",
                    help="report per-frame latency of a single live stream "
                         "(device step time; scan time / frames)")
    ap.add_argument("--live", action="store_true",
                    help="time LiveCharacterizer.push_frame per frame "
                         "(real serving latency incl. host dispatch); "
                         "reports p50/p99 over >=1k frames")
    ap.add_argument("--pipelined", action="store_true",
                    help="with --live: one-frame-pipelined serving "
                         "(push_frame_pipelined: output lags one frame, "
                         "each call pays a single host<->device trip)")
    ap.add_argument("--train", action="store_true",
                    help="generator training steps/sec at reference scale "
                         "(batch 64, full model)")
    ap.add_argument("--train-cvae", action="store_true",
                    help="CVAE scheduled-sampling rollout trainer "
                         "iterations/s at reference scale (batch 32, "
                         "rollout 10 -> 9 in-scan optimizer updates per "
                         "iteration; train_CVAE.py:225-259). Batches are "
                         "pre-assembled and pre-placed like --train; "
                         "--sync-h2d times host assembly + relay upload "
                         "inside the loop instead")
    ap.add_argument("--monolithic", action="store_true",
                    help="with --train: force the single-program step "
                         "(the shipped config already runs it; kept for "
                         "compat with r2 invocations)")
    ap.add_argument("--split-step", action="store_true",
                    help="with --train: the heavy fallback mode — 7 "
                         "separately-jitted programs + f64 loss tails "
                         "(pre-tail-barrier default, 2.9x slower)")
    ap.add_argument("--no-tail-barrier", action="store_true",
                    help="with --train: drop the forward/loss-tail "
                         "optimization_barrier — on the current v5e "
                         "terminal the fully fused step NaNs (the "
                         "miscompile probe)")
    ap.add_argument("--train-steps", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--remat", action="store_true",
                    help="with --train: jax.checkpoint the generator "
                         "forwards (recompute-in-backward); needed for "
                         "batch >= 256 on a 16 GB chip")
    ap.add_argument("--loss-f32", action="store_true",
                    help="with --train: compute the loss tails in f32 "
                         "instead of the default f64 (config.yaml "
                         "loss_dtype). f64 is software-emulated on TPU — "
                         "this isolates its cost; check the printed "
                         "loss_finite before trusting the mode on this "
                         "terminal (the f64 tails are part of the "
                         "miscompile workaround)")
    ap.add_argument("--tail-barrier", action="store_true",
                    help="with --train: optimization_barrier between the "
                         "generator forwards and the loss tails — blocks "
                         "the fusion the v5e-terminal XLA miscompiles; "
                         "combine with --loss-f32 to try full-speed f32 "
                         "tails")
    ap.add_argument("--sync-h2d", action="store_true",
                    help="with --train: ship each batch host->device "
                         "synchronously inside the timed loop instead of "
                         "pre-placing (the production pipeline prefetches; "
                         "this measures the relay upload, not the step)")
    ap.add_argument("--attn", action="store_true",
                    help="A/B the Pallas fused attention vs the XLA einsum "
                         "path at decoder shapes")
    ap.add_argument("--fused-attention", action="store_true",
                    help="enable the Pallas fused-attention dispatch in the "
                         "stream step for this run")
    args = ap.parse_args()
    if args.pipelined and not args.live:
        ap.error("--pipelined requires --live")
    if args.live and (args.lean_decode or args.fuse_decodes or args.no_ik
                      or args.unroll != 1 or args.characters > 1
                      or args.bf16_cvae):
        ap.error("--live ignores --lean-decode/--fuse-decodes/--no-ik/"
                 "--unroll/--characters/--bf16-cvae; drop them so the "
                 "label matches the measurement")
    from mocha_sigasia2023_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    if args.rbg_prng:
        import jax
        jax.config.update("jax_default_prng_impl", "rbg")
    if args.attn:
        return bench_attn(args)
    if args.fused_attention:
        from mocha_sigasia2023_tpu.ops import attention as _fa
        _fa.set_fused_attention(True)
    if args.train and args.train_cvae:
        ap.error("--train and --train-cvae are mutually exclusive")
    if args.train_cvae:
        return bench_train_cvae(args)
    if args.train:
        return bench_train(args)
    if args.e2e and args.step_loop:
        ap.error("--e2e and --step-loop are mutually exclusive")
    if args.e2e and (args.characters > 1 or args.lean_decode
                     or args.fuse_decodes or args.unroll != 1
                     or args.latency):
        ap.error("--e2e ignores --characters/--lean-decode/--fuse-decodes/"
                 "--unroll/--latency; drop them (or use --step-loop) so "
                 "the label matches the measurement")
    if args.latency or args.live:
        args.streams = 1
    if args.live and args.frames < 1000:
        args.frames = 1010

    if args.e2e:
        result = bench_e2e(args)
    elif args.step_loop or args.latency or args.live:
        result = bench_steploop(args)
    else:
        # default: BOTH instruments, end-to-end as the headline (the
        # step-loop number alone overstates throughput — it excludes the
        # per-frame featurize+encode pass the reference demo performs
        # inside its loop)
        step_res = bench_steploop(args)
        result = bench_e2e(args)
        result["step_loop_frames_per_sec"] = step_res["value"]
    if result is not None:
        print(json.dumps(result))


def bench_steploop(args):
    import jax
    import jax.numpy as jnp

    from mocha_sigasia2023_tpu.models import CVAEConfig, GeneratorConfig
    from mocha_sigasia2023_tpu.models.cvae import init_cvae
    from mocha_sigasia2023_tpu.models.generator import init_generator
    from mocha_sigasia2023_tpu.runtime.stream import (
        RuntimeConsts, make_batch_runner, stack_stream_inputs,
    )

    cfg = GeneratorConfig()
    cvae_cfg = CVAEConfig(output_seq=cfg.num_tokens)
    key = jax.random.PRNGKey(0)
    params = init_generator(key, cfg)
    cvae_params = None if args.no_cvae else init_cvae(
        jax.random.fold_in(key, 1), cvae_cfg)

    S, T, M = args.streams, args.frames, args.db_size
    J = cfg.njoints + 1
    tok, dim = cfg.num_tokens, cfg.encoder_dim
    rng = np.random.RandomState(0)

    feats = {
        "encoded": rng.randn(S, T, tok, dim).astype(np.float32),
        "pos_last": rng.randn(S, T, J, 3).astype(np.float32) * 0.1,
        "rot_last": np.tile(np.array([1, 0, 0, 0], np.float32), (S, T, J, 1)),
        "vel_last": rng.randn(S, T, J, 3).astype(np.float32) * 0.1,
        "ang_last": rng.randn(S, T, J, 3).astype(np.float32) * 0.1,
        "rvel_last": rng.randn(S, T, 3).astype(np.float32) * 0.1,
        "rang_last": rng.randn(S, T, 3).astype(np.float32) * 0.1,
        "contact_last": (rng.rand(S, T, 2) > 0.5).astype(np.float32),
        "hips_speed_mean": (rng.rand(S, T).astype(np.float32) + 0.5),
    }
    cha_cnt_flat = rng.randn(M, tok * dim).astype(np.float32)
    mean = np.zeros((tok, dim), np.float32)
    std = np.ones((tok, dim), np.float32)
    consts = RuntimeConsts(
        Y_mean=jnp.zeros((J, 15), jnp.float32),
        Y_std=jnp.ones((J, 15), jnp.float32),
        cha_encoded=jnp.asarray(rng.randn(M, tok, dim).astype(np.float32)),
        cha_cnt_flat=jnp.asarray(cha_cnt_flat),
        cha_cnt_sq=jnp.asarray(np.sum(cha_cnt_flat ** 2, axis=-1)),
        cnt_mean=jnp.asarray(mean), cnt_std=jnp.asarray(std),
        src_cnt_mean=jnp.asarray(mean), src_cnt_std=jnp.asarray(std),
        cha_encoded_mean=jnp.asarray(mean), cha_encoded_std=jnp.asarray(std),
    )
    parents = np.concatenate(
        [[-1], np.array([-1, 0, 1, 2, 3, 0, 5, 6, 7, 8, 9, 10, 11, 8, 13,
                         14, 8, 16, 17, 18, 0, 20, 21, 22]) + 1])

    compute_dtype = jnp.bfloat16 if args.bf16 else None
    cvae_dtype = jnp.bfloat16 if (args.bf16 or args.bf16_cvae) else None
    if args.bf16:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    if (args.bf16 or args.bf16_cvae) and cvae_params is not None:
        cvae_params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), cvae_params)
    if args.live:
        # the live path feeds per-frame host dicts; keep the cnt array
        # (LiveCharacterizer.FEAT_KEYS contract)
        feats["cnt"] = rng.randn(S, T, tok, dim).astype(np.float32)
        return bench_live(args, params, cfg, cvae_params, cvae_cfg, consts,
                          parents, feats)
    if args.carry_cnt:
        # pre-r4 form: stream an explicit (redundant) cnt array; the
        # default re-derives cnt = mean_variance_norm(encoded) on demand.
        # With --carry-cnt the synthetic cnt must be the self-consistent
        # value or the two forms measure different CVAE conditions.
        from mocha_sigasia2023_tpu.models.generator import content_feature
        feats["cnt"] = np.asarray(jax.jit(content_feature)(
            jnp.asarray(feats["encoded"])))

    from mocha_sigasia2023_tpu.runtime.stream import (
        IKConfig, cast_database, stack_consts,
    )
    multi = args.characters > 1
    if multi:
        # N characters: shift the one synthetic database per character
        consts = stack_consts([
            consts._replace(cha_encoded=consts.cha_encoded + 0.01 * c)
            for c in range(args.characters)])
    if args.db_bf16:
        consts = cast_database(consts, jnp.bfloat16)
    runner = make_batch_runner(params, cfg, cvae_params, cvae_cfg, consts,
                               parents, compute_cm=not args.single_stream,
                               ik=IKConfig(enabled=not args.no_ik),
                               deterministic=args.deterministic,
                               compute_dtype=compute_dtype,
                               cvae_dtype=cvae_dtype,
                               unroll=args.unroll,
                               fuse_decodes=args.fuse_decodes,
                               lean_decode=args.lean_decode,
                               multi_character=multi)
    char_ids = (np.arange(S, dtype=np.int32) % args.characters
                if multi else None)
    if args.tchunk:
        # host-resident xs, streamed to the device in time chunks —
        # bounded HBM residency (unblocks S=256); upload of chunk c+1
        # overlaps the scan of chunk c
        run = lambda f0, xs_, ks: runner.chunked(
            f0, xs_, ks, char_ids=char_ids, tchunk=args.tchunk)
    elif multi:
        run = lambda f0, xs_, ks: runner(f0, xs_, ks, char_ids)
    else:
        run = runner
    frame0, xs = stack_stream_inputs(feats, device=not args.tchunk)
    keys = jax.random.split(jax.random.PRNGKey(7), S)

    def sync(out):
        # fetch a small leaf to the host: jax.block_until_ready does not
        # actually block under the axon remote backend, so host
        # materialization is the only reliable completion barrier
        np.asarray(out["nn_index"])

    # warmup / compile (twice: first run compiles, second warms the path)
    for _ in range(2):
        out = run(frame0, xs, keys)
        sync(out)

    if args.measure_retrace:
        if not multi:
            raise SystemExit("--measure-retrace needs --characters > 1")
        # the grouped matcher's group_size (largest per-character stream
        # count) is a static arg: a NEW character distribution with a
        # different max retraces + recompiles the scan program once per
        # distinct size.  Time that one-off against the warm call.
        skewed = np.zeros(S, np.int32)  # all streams on character 0
        skewed[-(args.characters - 1):] = np.arange(
            1, args.characters, dtype=np.int32)
        t0 = time.perf_counter()
        sync(runner(frame0, xs, keys, skewed))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(runner(frame0, xs, keys, skewed))
        warm = time.perf_counter() - t0
        print(f"[retrace] new group_size distribution: first call "
              f"{cold:.1f} s (trace+compile+run), warm {warm*1e3:.0f} ms "
              f"-> one-off compile cost ~{cold - warm:.1f} s per distinct "
              "per-character max stream count", file=sys.stderr)

    times = []
    for r in range(args.repeats):
        ks = jax.random.split(jax.random.PRNGKey(100 + r), S)
        t0 = time.perf_counter()
        out = run(frame0, xs, ks)
        sync(out)
        times.append(time.perf_counter() - t0)

    best = min(times)
    if args.latency:
        # per-frame device latency for one live stream: amortized over the
        # scanned frames (host<->relay RTT excluded by construction).
        # Baseline: the 16.6 ms real-time budget (dt = 1/60).
        ms = best / T * 1e3
        result = {
            "metric": "per_frame_latency_single_stream",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round((1000.0 / 60.0) / ms, 2),
        }
    else:
        fps = S * T / best
        result = {
            "metric": "characterized_frames_per_sec_per_chip",
            "value": round(fps, 1),
            "unit": "frames/s/chip",
            "vs_baseline": round(fps / 60.0, 2),
        }
    return result


def bench_e2e(args):
    """End-to-end throughput: the pipeline the reference demo actually runs
    per frame (test_fullframework.py:124-203,438) — raw clip arrays ->
    featurize_clip (root synthesis, velocities, contacts) -> sliding-window
    gather -> X/Y derive -> batched encoder -> batched stream scan -> poses.

    Source clips are synthetic mocha-rig motion (the dataset is
    download-only); the character database is a --db-size-window clip
    encoded once at setup (offline in production, as in the reference).
    Timed region per repeat: S featurize+encode dispatches (one jitted
    program each, runtime.features.clip_stream_features_device), the
    frame0/xs assembly, and the stream scan, to host materialization."""
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

    cfg = GeneratorConfig()
    cvae_cfg = CVAEConfig(output_seq=cfg.num_tokens)
    key = jax.random.PRNGKey(0)
    params = init_generator(key, cfg)
    cvae_params = None if args.no_cvae else init_cvae(
        jax.random.fold_in(key, 1), cvae_cfg)
    compute_dtype = jnp.bfloat16 if args.bf16 else None
    cvae_dtype = jnp.bfloat16 if (args.bf16 or args.bf16_cvae) else None
    if args.bf16:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    if (args.bf16 or args.bf16_cvae) and cvae_params is not None:
        cvae_params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), cvae_params)

    # ---- setup (offline in production, untimed): character database ----
    S, F = args.streams, args.frames
    win = 60
    pad = win // 4  # featurize yields T - window//4 windows per clip
    cha_clip = make_mocha_bvh_data(T=args.db_size + pad, seed=10_000,
                                   walk_speed=60.0)
    src_clips = [make_mocha_bvh_data(T=F + pad, seed=i) for i in range(S)]

    # norm stats derived from the character clip (demo mode — no dataset)
    from mocha_sigasia2023_tpu.data import preprocess as pre
    from mocha_sigasia2023_tpu.data.dataset import (
        compute_norm_stats, window_xy_features,
    )
    from mocha_sigasia2023_tpu.data.windows import window_features

    feats0 = pre.featurize_clip_jit(cha_clip)
    w = window_features(feats0, win, 10, padded=False)
    X, Y, root = window_xy_features(
        w["rotations"], w["positions"], w["velocities"],
        w["angular_velocities"], feats0["bone_parents"])
    norm = compute_norm_stats(np.asarray(X), np.asarray(Y), np.asarray(root))

    def log(msg):
        print(f"[e2e] {msg}", file=sys.stderr, flush=True)

    log(f"setup: encoding character database ({args.db_size} windows) ...")
    cha_feats = rtf.clip_stream_features_device(cha_clip, params, cfg, norm,
                                                compute_dtype=compute_dtype)
    cha_feats = {k: (np.asarray(v) if k != "bone_names" else v)
                 for k, v in cha_feats.items()}
    log("character database ready")
    cnt_norm = rtf.compute_cnt_norm(cha_feats["encoded"], cha_feats["cnt"])
    consts = build_consts(norm, cnt_norm, None, cha_feats)
    if args.db_bf16:
        from mocha_sigasia2023_tpu.runtime.stream import cast_database
        consts = cast_database(consts, jnp.bfloat16)
    parents = cha_feats["bone_parents"]

    runner = make_batch_runner(params, cfg, cvae_params, cvae_cfg, consts,
                               parents, ik=IKConfig(enabled=not args.no_ik),
                               deterministic=args.deterministic,
                               compute_dtype=compute_dtype,
                               cvae_dtype=cvae_dtype,
                               compute_cm=not args.single_stream)
    keys = jax.random.split(jax.random.PRNGKey(7), S)

    # pre-stack the raw clip arrays once (host numpy; in production these
    # arrive as one buffer per batch) — the timed region covers the device
    # featurize+encode+window program and the stream scan, two dispatches
    src_rot = [np.asarray(c["rotations"], np.float32) for c in src_clips]
    src_pos = [np.asarray(c["positions"], np.float32) for c in src_clips]

    def run_once(ks):
        clips = [{"rotations": r, "positions": p,
                  "order": src_clips[0]["order"],
                  "names": src_clips[0]["names"],
                  "parents": src_clips[0]["parents"]}
                 for r, p in zip(src_rot, src_pos)]
        # emit_cnt=False: the runner re-derives cnt from encoded (exact) —
        # the shipped CLI form (characterize --src-dir)
        frame0, xs = rtf.batch_stream_features_device(
            clips, params, cfg, norm, compute_dtype=compute_dtype,
            emit_cnt=args.carry_cnt, chunk=args.chunk)
        out = runner(frame0, xs, ks)
        np.asarray(out["nn_index"])  # host fetch = completion barrier

    for i in range(2):  # compile + warm
        log(f"warmup {i}: featurize+encode {S} clips + stream scan ...")
        run_once(keys)
    log("measuring ...")

    times = []
    for r in range(args.repeats):
        ks = jax.random.split(jax.random.PRNGKey(100 + r), S)
        t0 = time.perf_counter()
        run_once(ks)
        times.append(time.perf_counter() - t0)

    n_frames = S * F
    fps = n_frames / min(times)
    return {
        "metric": "e2e_characterized_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 60.0, 2),
        "streams": S,
        "frames_per_stream": F,
        # the featurize half stacks/uploads on host, so concurrent host
        # CPU load leaks into this instrument (measured -3..-7% with a
        # test suite running on a 1-CPU relay host; the step-loop half is
        # load-stable).  Stamp the 1-min load so captures are comparable.
        "host_load_1m": round(os.getloadavg()[0], 2),
    }


def bench_live(args, params, cfg, cvae_params, cvae_cfg, consts, parents,
               feats):
    """Real live-serving latency: LiveCharacterizer.push_frame wall time
    per frame, p50/p99, including host dispatch and output materialization
    (the axon relay adds a fixed host<->device RTT per frame; the reported
    relay_floor_ms — the time to fetch one tiny ready array — bounds it)."""
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from mocha_sigasia2023_tpu.runtime.live import LiveCharacterizer

    lc = LiveCharacterizer(params, cfg, cvae_params, cvae_cfg, consts,
                           parents, deterministic=args.deterministic)
    T = args.frames
    frames = [{k: feats[k][0, i] for k in LiveCharacterizer.FEAT_KEYS}
              for i in range(T)]

    # warmup: compile init + step programs
    lc.push_frame(frames[0])
    for i in range(1, 4):
        lc.push_frame(frames[i])
    lc.reset()

    # relay floor: host-fetch of a tiny, already-computed device array
    tiny = jnp.zeros((4,), jnp.float32) + 1
    np.asarray(tiny)
    floors = []
    for _ in range(50):
        t0 = time.perf_counter()
        np.asarray(tiny + 0)  # noqa — one dispatch + one fetch
        floors.append(time.perf_counter() - t0)
    relay_floor_ms = float(np.median(floors) * 1e3)

    push = (lc.push_frame_pipelined if args.pipelined else lc.push_frame)
    times = []
    lc.push_frame(frames[0])  # frame-0 init outside the measured window
    for i in range(1, T):
        t0 = time.perf_counter()
        push(frames[i])
        times.append(time.perf_counter() - t0)
    if args.pipelined:
        lc.flush()
    arr = np.asarray(times) * 1e3
    p50 = float(np.percentile(arr, 50))
    p99 = float(np.percentile(arr, 99))
    result = {
        "metric": ("live_push_frame_pipelined_latency_p50" if args.pipelined
                   else "live_push_frame_latency_p50"),
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round((1000.0 / 60.0) / p50, 2),
        "p99_ms": round(p99, 3),
        "frames": len(arr),
        "relay_floor_ms": round(relay_floor_ms, 3),
    }
    return result


def bench_attn(args):
    """On-chip A/B: ops.attention.fused_attention (Pallas) vs the plain
    XLA einsum+softmax at the decoder shapes (B=2x64 streams, 4 heads,
    90 tokens, head dim 256 — model.py:62-68)."""
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from mocha_sigasia2023_tpu.ops.attention import fused_attention

    B, H, N, d = 2 * args.streams, 4, 90, 256
    scale = d ** -0.5
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, N, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, d),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, d),
                          jnp.float32)

    @jax.jit
    def xla_attn(q, k, v):
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        p = jax.nn.softmax(dots, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    pallas_attn = jax.jit(lambda q, k, v: fused_attention(q, k, v,
                                                          scale=scale))

    def measure(fn, iters=50):
        out = fn(q, k, v)
        np.asarray(out[0, 0, 0, 0])  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(q, k, v)
        np.asarray(out[0, 0, 0, 0])
        return (time.perf_counter() - t0) / iters * 1e3

    ms_xla = measure(xla_attn)
    ms_pallas = measure(pallas_attn)
    a = np.asarray(xla_attn(q, k, v))
    b = np.asarray(pallas_attn(q, k, v))
    max_diff = float(np.abs(a - b).max())
    result = {
        "metric": "fused_attention_speedup_vs_xla",
        "value": round(ms_xla / ms_pallas, 3),
        "unit": "x",
        "vs_baseline": 1.0,
        "xla_ms": round(ms_xla, 4),
        "pallas_ms": round(ms_pallas, 4),
        "max_abs_diff": max_diff,
        "shape": [B, H, N, d],
    }
    print(json.dumps(result))


def bench_train(args):
    """Generator-trainer throughput at reference scale (batch 64, full
    model, 6 forwards + FK losses per step — configs/config.yaml:49-63).
    Default = the shipped config (tail-barrier monolithic step, f32
    tails); --split-step measures the heavy fallback; --no-tail-barrier
    probes the raw fused step (NaNs on the current terminal)."""
    import os
    import time

    import numpy as np
    import jax

    from mocha_sigasia2023_tpu.utils.config import get_config
    from mocha_sigasia2023_tpu.train.trainer import GeneratorTrainer

    config = get_config(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "mocha_sigasia2023_tpu", "configs", "config.yaml"))
    # The no-flag run measures the SHIPPED config (tail-barrier monolithic
    # step, f32 tails).  Flags are explicit overrides:
    if args.split_step:
        # the heavy fallback combo documented in README Environment notes
        config["split_step"] = True
        config["tail_barrier"] = False
        config["loss_dtype"] = "float64"
    if args.monolithic:
        config["split_step"] = False
    if args.bf16:
        # bf16 forwards, f32 master weights + loss tails
        config["compute_dtype"] = "bfloat16"
    if args.remat:
        config["remat"] = True
    if args.loss_f32:
        config["loss_dtype"] = None
    if args.tail_barrier:
        config["tail_barrier"] = True
    if args.no_tail_barrier:
        config["tail_barrier"] = False
    trainer = GeneratorTrainer(config, steps_per_epoch=100)

    B, T, J = args.batch_size, 60, 25

    def make_batch(seed):
        r = np.random.RandomState(seed)
        return {
            "X": r.randn(B, T, J, 15).astype(np.float32),
            "Y": r.randn(B, T, J, 15).astype(np.float32),
            "root": r.randn(B, T, 6).astype(np.float32),
            "contact": r.rand(B, T, 2).astype(np.float32),
            "label": np.zeros(B, np.int32),
        }

    norm = {
        "X_mean": np.zeros((J, 15), np.float32),
        "X_std": np.ones((J, 15), np.float32),
        "Y_mean": np.zeros((J, 15), np.float32),
        "Y_std": np.ones((J, 15), np.float32),
    }
    batches = [make_batch(s) for s in range(4)]
    if not args.sync_h2d:
        # pre-place on device: the production input pipeline issues the
        # sharded device_put ahead of the step (data.dataset.prefetch_batches
        # with place=shard_batch), so the step never waits on H2D.  Without
        # this the bench measures the relay's synchronous batch upload
        # (~0.5 s/step at batch 128 here), not the training step — measured
        # windows/s was FLAT in batch size, the signature of a transfer
        # bound.  --sync-h2d restores the naive instrument.
        from mocha_sigasia2023_tpu.parallel import shard_batch
        batches = [shard_batch(trainer.mesh, b) for b in batches]
    key = jax.random.PRNGKey(0)

    # warmup/compile
    tw = time.perf_counter()
    for i in range(2):
        key, sub = jax.random.split(key)
        m = trainer.train_step(batches[i % 2], batches[(i + 1) % 2],
                               norm, sub)
        total = float(m["gen/loss_total"])  # host fetch = sync barrier
        print(f"warmup step {i}: {time.perf_counter() - tw:.1f}s "
              f"loss={total:.4f}", file=sys.stderr)
        tw = time.perf_counter()
    assert np.isfinite(total), (
        "training step produced non-finite loss (v5e terminal XLA "
        "miscompile? see train/trainer.py make_split_step_fns)")

    t0 = time.perf_counter()
    for i in range(args.train_steps):
        key, sub = jax.random.split(key)
        m = trainer.train_step(batches[i % 4], batches[(i + 1) % 4],
                               norm, sub)
    # fetch only the last metric: dispatches chain on-device, one sync
    total = float(m["gen/loss_total"])
    elapsed = time.perf_counter() - t0
    assert np.isfinite(total)

    steps_per_sec = args.train_steps / elapsed
    # label from the RESOLVED config, not the flags
    mode = "split" if config.get("split_step") else "monolithic"
    if config.get("tail_barrier"):
        mode += "_bar"
    if args.bf16:
        mode += "_bf16"
    if args.remat:
        mode += "_remat"
    ld = config.get("loss_dtype")
    if ld:
        mode += f"_loss{str(ld).replace('float', 'f')}"
    result = {
        "metric": f"train_steps_per_sec_{mode}",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        # no reference number exists; report windows/s context instead
        "vs_baseline": round(steps_per_sec * B, 1),
        "windows_per_sec": round(steps_per_sec * B, 1),
        "batch_size": B,
    }
    print(json.dumps(result))


def bench_train_cvae(args):
    """CVAE-trainer throughput at reference scale: batch 32 rollouts of 10
    consecutive 90-token windows, 9 in-scan AdamW updates per iteration
    (train_CVAE.py:225-259 -> trainer_cvae.CVAETrainer._rollout_impl).

    Default instrument pre-assembles and pre-places 4 batches (like
    --train: the production pipeline overlaps host batch assembly with the
    device rollout, and on the relay a synchronous ~90 MB/iteration upload
    would swamp the step); --sync-h2d times the naive
    ``train_iteration`` loop (host NN + noise + relay upload inside)."""
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from mocha_sigasia2023_tpu.train.trainer_cvae import (
        CVAETrainer, CVAETrainerConfig)

    # --batch-size defaults to the GENERATOR's 64; the CVAE reference
    # batch is 32 (train_CVAE.py config), so only honor an explicit flag
    B = args.batch_size if "--batch-size" in sys.argv else 32
    # production dims: 256/2/4/512/90; --bf16 = mixed-precision forwards
    # (f32 master weights + loss tails)
    tc = CVAETrainerConfig(
        batch_size=B,
        compute_dtype="bfloat16" if args.bf16 else None)

    rng = np.random.RandomState(0)
    n_src, n_cha, S, D = 2048, 2048, tc.nseq, tc.latent_dim
    src_cnt = rng.randn(n_src, S, D).astype(np.float32)
    cha_cnt = rng.randn(n_cha, S, D).astype(np.float32)
    cha_enc = rng.randn(n_cha, S, D).astype(np.float32)
    trainer = CVAETrainer(
        tc,
        src_cnt=src_cnt, src_action=np.zeros(n_src, np.int32),
        src_range_starts=np.array([0]), src_range_stops=np.array([n_src]),
        cha_cnt=cha_cnt, cha_encoded=cha_enc,
        cha_action=np.zeros(n_cha, np.int32),
        cha_range_starts=np.array([0]), cha_range_stops=np.array([n_cha]),
        cnt_mean=cha_cnt.mean(0), cnt_std=cha_cnt.std(0) + 1e-6,
        target_actions=[0])

    if args.sync_h2d:
        m = trainer.train_iteration(0)  # compile + warmup
        m = trainer.train_iteration(1)
        assert m is not None and np.isfinite(m["cvae/encoded_loss"])
        t0 = time.perf_counter()
        for i in range(args.train_steps):
            m = trainer.train_iteration(2 + i)
        elapsed = time.perf_counter() - t0
        assert np.isfinite(m["cvae/encoded_loss"])
    else:
        batches = []
        for it in range(4):
            b = trainer.sample_batch(it)
            assert b is not None
            batches.append(tuple(jax.device_put(jnp.asarray(a))
                                 for a in b))
        params, opt_state = trainer.params, trainer.opt_state
        key = trainer.key
        sched = jnp.float32(trainer.schedule[0])
        anneal = jnp.float32(trainer.anneal_weight(0))
        tw = time.perf_counter()
        for i in range(2):  # warmup/compile
            key, sub = jax.random.split(key)
            params, opt_state, m = trainer._rollout(
                params, opt_state, *batches[i % 4], sched, anneal, sub)
            enc = float(np.asarray(m)[0])  # host fetch = sync barrier
            print(f"warmup iter {i}: {time.perf_counter() - tw:.1f}s "
                  f"enc_l1={enc:.4f}", file=sys.stderr)
            tw = time.perf_counter()
        assert np.isfinite(enc)
        t0 = time.perf_counter()
        for i in range(args.train_steps):
            key, sub = jax.random.split(key)
            params, opt_state, m = trainer._rollout(
                params, opt_state, *batches[i % 4], sched, anneal, sub)
        enc = float(np.asarray(m)[0])
        elapsed = time.perf_counter() - t0
        assert np.isfinite(enc)

    iters_per_sec = args.train_steps / elapsed
    updates = max(tc.rollout_steps - 1, 1)
    result = {
        "metric": "cvae_train_iterations_per_sec"
                  + ("_bf16" if args.bf16 else "")
                  + ("_sync_h2d" if args.sync_h2d else ""),
        "value": round(iters_per_sec, 3),
        "unit": "iters/s",
        # no reference number exists; report rollout windows/s context
        "vs_baseline": round(iters_per_sec * B * tc.rollout_steps, 1),
        "windows_per_sec": round(iters_per_sec * B * tc.rollout_steps, 1),
        "optimizer_updates_per_sec": round(iters_per_sec * updates, 2),
        "batch_size": B,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
