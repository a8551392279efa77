#!/usr/bin/env python
"""Headline benchmark: characterized frames/sec/chip on the streaming loop.

Measures the full production per-frame step — NN context match over a
character database, CVAE sample, decoder + motion head, root integration,
foot-contact locking + two-bone IK — batched over parallel streams and
scanned over frames, exactly the runtime path (runtime/stream.py).

Baseline: the reference's implied real-time contract is 60 frames/sec per
stream (test_fullframework.py:105, dt=1/60; no published numbers —
BASELINE.md).  ``vs_baseline`` = frames/sec/chip / 60.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--db-size", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-cvae", action="store_true")
    ap.add_argument("--single-stream", action="store_true",
                    help="production path only (skip the NN cm decode)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 decoder/CVAE matmuls, f32 pose math")
    ap.add_argument("--unroll", type=int, default=1,
                    help="lax.scan unroll factor for the frame loop")
    ap.add_argument("--latency", action="store_true",
                    help="report per-frame latency of a single live stream "
                         "(device step time; scan time / frames)")
    args = ap.parse_args()
    if args.latency:
        args.streams = 1

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
        "cnt": rng.randn(S, T, tok, dim).astype(np.float32),
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
    if args.bf16:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        if cvae_params is not None:
            cvae_params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), cvae_params)
    run = make_batch_runner(params, cfg, cvae_params, cvae_cfg, consts,
                            parents, compute_cm=not args.single_stream,
                            compute_dtype=compute_dtype, unroll=args.unroll)
    frame0, xs = stack_stream_inputs(feats)
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
    print(json.dumps(result))


if __name__ == "__main__":
    main()
