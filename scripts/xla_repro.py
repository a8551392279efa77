#!/usr/bin/env python
"""Minimal reproducers for the v5e-terminal XLA:TPU miscompiles.

Three sites in the framework carry workarounds for silent miscompiles /
compiler crashes observed on this terminal's XLA:
  * kinematics/xform.py — 3x3 products spelled elementwise because the
    algebraic simplifier RET_CHECK-crashes (hlo_computation.cc:1773)
    rewriting the transposed tiny dot_generals in the FK-loss backward,
  * train/losses.py — the local-rotation delta term computed on the flat
    6-channel view because the 5D (B,T,J,3,2) time-shifted difference goes
    NaN inside the fused training program,
  * train/trainer.py make_split_step_fns — the whole training step split
    into 7 separately-jitted programs because any single program fusing
    >=2 generator forwards with the FK reconstruction backward goes NaN.

This script is the 30-second check that retires them: run it after any
toolchain update.  If every case prints FINITE under the default flags,
the workarounds can be removed (flip ``split_step: false``, restore the
einsum forms) — re-run `bench.py --train --monolithic` to confirm.

Recorded results on the current terminal (2026-08-17, jax 0.9.0, v5e via
the axon relay):

    mono_train         @ default      -> NAN   <- the pinned miscompile
    mono_train         @ no-algsimp   -> NAN   (algsimp is NOT the culprit)
    mono_train         @ opt-level-0  -> NAN   (survives minimum opt level)
    mono_train_barrier @ default      -> FINITE  <- the FIX
    fk_einsum_grad     @ all flags    -> FINITE
    delta5d_grad       @ all flags    -> FINITE

i.e. the monolithic-step NaN reproduces deterministically from the real
trainer but needs the LARGE fused program — the two extracted micro
patterns are individually clean on this toolchain, and neither disabling
the algebraic simplifier nor dropping the backend optimization level
rescues the monolith.  The targeted fix that DOES work is
``tail_barrier: true`` (train/trainer.py ``_bar``): one
jax.lax.optimization_barrier between each generator forward and its loss
tail forbids exactly the forward-backward x FK-loss-backward cross-fusion
that miscompiles, while leaving every other fusion free — the monolithic
step then runs finite with plain-f32 tails at full speed
(bench.py --train --monolithic --loss-f32 --tail-barrier; 40-step finite,
~3x the split-step+f64 workaround).  split_step/f64 tails remain as the
fallback if a future toolchain defeats the barrier.

Usage:
  python scripts/xla_repro.py              # all cases x flag sets (subprocesses)
  python scripts/xla_repro.py --case mono_train   # one case, in-process

Each (case, flags) runs in its own subprocess: the fk_einsum_grad case can
crash the process outright (the RET_CHECK), and XLA_FLAGS are read once at
backend init.
"""

import argparse
import json
import os
import subprocess
import sys

# repo root on the path: this file lives in <repo>/scripts/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = ("mono_train", "mono_train_barrier", "fk_einsum_grad",
         "delta5d_grad")
FLAG_SETS = {
    "default": "",
    # bisect attempt 1: skip the algebraic-simplifier pass family (the
    # RET_CHECK crash is inside it)
    "no-algsimp": "--xla_disable_hlo_passes=algsimp",
    # bisect attempt 2: lowest backend optimization level
    "opt-level-0": "--xla_backend_optimization_level=0",
}


def run_case(case: str) -> str:
    """Returns 'FINITE' or 'NAN'; a compiler crash kills the process."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    if case in ("mono_train", "mono_train_barrier"):
        # the real monolithic training step at reduced scale — the primary
        # reproducer (bench.py --train --monolithic fails the same way).
        # The _barrier variant adds tail_barrier: true (the fix) and must
        # print FINITE wherever plain mono_train prints NAN.
        from mocha_sigasia2023_tpu.train.trainer import GeneratorTrainer

        config = {
            "name": "repro",
            "dataset": {"mocha": {"parents": [
                -1, 0, 1, 2, 3, 0, 5, 6, 7, 8, 9, 10, 11, 8, 13, 14, 8,
                16, 17, 18, 0, 20, 21, 22]}},
            "model": {
                "mot_in_dim": 15, "nframes": 60, "njoints": 24, "nbody": 6,
                "temporal_patch_size": 4,
                "encoder_dim": 256, "encoder_depth": 2, "encoder_heads": 4,
                "encoder_dim_head": 128, "encoder_mlp_dim": 512,
                "decoder_dim": 256, "decoder_depth": 2, "decoder_heads": 4,
                "decoder_dim_head": 256, "decoder_mlp_dim": 512,
                "prj_dim": 1024, "num_patches": -1,
                "graph": {
                    "joint": {"layout": "mocha", "strategy": "distance",
                              "max_hop": 2},
                    "bodypart": {"layout": "mocha", "strategy": "distance",
                                 "max_hop": 1},
                },
            },
            "lr_gen": 1e-4, "weight_decay_gen": 1e-4, "lr_drop": 100,
            "rec_w": 1, "nce_w": 0.1, "cyc_w": 1,
            "split_step": False,  # <- the monolithic program under test
            "tail_barrier": case == "mono_train_barrier",
        }
        trainer = GeneratorTrainer(config, steps_per_epoch=10)
        r = np.random.RandomState(0)
        B, T, J = 8, 60, 25

        def batch(seed):
            rr = np.random.RandomState(seed)
            return {"X": rr.randn(B, T, J, 15).astype(np.float32),
                    "Y": rr.randn(B, T, J, 15).astype(np.float32),
                    "root": rr.randn(B, T, 6).astype(np.float32),
                    "contact": rr.rand(B, T, 2).astype(np.float32),
                    "label": np.zeros(B, np.int32)}

        norm = {"X_mean": np.zeros((J, 15), np.float32),
                "X_std": np.ones((J, 15), np.float32),
                "Y_mean": np.zeros((J, 15), np.float32),
                "Y_std": np.ones((J, 15), np.float32)}
        m = trainer.train_step(batch(0), batch(1), norm,
                               jax.random.PRNGKey(0))
        val = float(m["gen/loss_total"])
        return "FINITE" if np.isfinite(val) else "NAN"

    if case == "fk_einsum_grad":
        # original einsum/matmul 3x3 FK form (what kinematics/xform.py
        # replaced with elementwise products): grad of an FK chain loss
        parents = np.array([-1, 0, 1, 2, 3, 0, 5, 6, 7, 8, 9, 10, 11, 8,
                            13, 14, 8, 16, 17, 18, 0, 20, 21, 22])
        parents = np.concatenate([[-1], parents + 1])

        def xmul(x, y):
            return jnp.einsum("...ij,...jk->...ik", x, y)

        def xmul_vec(x, v):
            return jnp.einsum("...ij,...j->...i", x, v)

        def from_xy(txy):
            x, y = txy[..., 0], txy[..., 1]
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
            z = jnp.cross(x, y)
            z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
            y2 = jnp.cross(z, x)
            return jnp.stack([x, y2, z], axis=-1)

        def loss_fn(txy, pos):
            xfm = from_xy(txy)
            gx = [xfm[..., 0, :, :]]
            gp = [pos[..., 0, :]]
            for j in range(1, len(parents)):
                p = parents[j]
                gx.append(xmul(gx[p], xfm[..., j, :, :]))
                gp.append(xmul_vec(gx[p], pos[..., j, :]) + gp[p])
            gx = jnp.stack(gx, axis=-3)
            gp = jnp.stack(gp, axis=-2)
            q = xmul(jnp.swapaxes(gx[..., 0:1, :, :], -1, -2), gx)
            return jnp.mean(jnp.abs(q)) + jnp.mean(jnp.abs(gp))

        r = np.random.RandomState(0)
        txy = jnp.asarray(r.randn(4, 8, 25, 3, 2).astype(np.float32))
        pos = jnp.asarray(r.randn(4, 8, 25, 3).astype(np.float32))
        g = jax.jit(jax.grad(loss_fn))(txy, pos)
        val = float(jnp.sum(g))
        return "FINITE" if np.isfinite(val) else "NAN"

    if case == "delta5d_grad":
        # original 5D-reshape time-shifted delta term (what train/losses.py
        # computes on the flat 6-channel view instead)
        def loss_fn(Y, Ygt):
            b, t, j = Y.shape[:3]
            txy5 = Y[..., 3:9].reshape(b, t, j, 3, 2)
            gt5 = Ygt[..., 3:9].reshape(b, t, j, 3, 2)
            d = (txy5[:, 1:] - txy5[:, :-1]) * 60.0
            dgt = (gt5[:, 1:] - gt5[:, :-1]) * 60.0
            return (jnp.mean(1.75 * jnp.abs(dgt - d))
                    + jnp.mean(10.0 * jnp.abs(gt5 - txy5)))

        r = np.random.RandomState(0)
        Y = jnp.asarray(r.randn(8, 60, 25, 15).astype(np.float32))
        Ygt = jnp.asarray(r.randn(8, 60, 25, 15).astype(np.float32))
        g = jax.jit(jax.grad(loss_fn))(Y, Ygt)
        val = float(jnp.sum(g))
        return "FINITE" if np.isfinite(val) else "NAN"

    raise SystemExit(f"unknown case {case}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None, choices=CASES,
                    help="run one case in-process (used by the driver)")
    ap.add_argument("--flags", default=None,
                    help="restrict the sweep to one flag set by name")
    args = ap.parse_args()

    if args.case:
        print(run_case(args.case))
        return

    here = os.path.abspath(__file__)
    results = {}
    flag_sets = ({args.flags: FLAG_SETS[args.flags]} if args.flags
                 else FLAG_SETS)
    for fname, flags in flag_sets.items():
        for case in CASES:
            env = dict(os.environ)
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
            p = subprocess.run([sys.executable, here, "--case", case],
                               env=env, capture_output=True, text=True,
                               timeout=1200)
            out = p.stdout.strip().splitlines()
            verdict = out[-1] if out and out[-1] in ("FINITE", "NAN") \
                else f"CRASH(rc={p.returncode})"
            results[f"{case} @ {fname}"] = verdict
            print(f"{case:18s} @ {fname:12s} -> {verdict}", flush=True)
            if verdict.startswith("CRASH"):
                for line in p.stderr.strip().splitlines()[-8:]:
                    print(f"    stderr| {line}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
