"""CVAE predictor training CLI.

Flow parity: /root/reference/train_CVAE.py — loads the dataset cnt_norm and
precomputed per-character feature files (our collect_features CLI /
runtime.features.collect_character_features), trains the autoregressive
predictor with scheduled sampling, saves cvae_norm.npz and periodic
checkpoints.

Run: python -m mocha_sigasia2023_tpu.cli.train_cvae \
         --src-features CVAE_transformer/Neutral_5action_feature.npz \
         --cha-features CVAE_transformer/Neutral_Princess_5action_feature.npz \
         --cnt-norm datasets/mocha60/cnt_norm.npz \
         --out CVAE_transformer/src2cha [--num-iters N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..train.checkpoint import save_checkpoint
from ..train.trainer_cvae import CVAETrainer, CVAETrainerConfig
from ..utils import ensure_dirs, get_config, set_seed
from ..utils.logging import MetricsLogger
from .characterize import DEFAULT_CONFIG


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=DEFAULT_CONFIG)
    ap.add_argument("--src-features", required=True)
    ap.add_argument("--cha-features", required=True)
    ap.add_argument("--cnt-norm", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--target-actions", type=int, nargs="*", default=None,
                    help="action label ids; default: all in the source set")
    ap.add_argument("--num-iters", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--save-every", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=1777)
    args = ap.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    cfg = get_config(args.config).get("cvae", {})
    tc = CVAETrainerConfig(
        latent_dim=cfg.get("latent_dim", 256),
        depth=cfg.get("depth", 2),
        nheads=cfg.get("nheads", 4),
        feedforward_dim=cfg.get("feedforward_dim", 512),
        rollout_steps=cfg.get("rollout_steps", 10),
        batch_size=args.batch_size or cfg.get("batch_size", 32),
        lr=cfg.get("lr", 1e-4),
        weight_decay=cfg.get("weight_decay", 1e-4),
        lr_gamma=cfg.get("lr_gamma", 0.99),
        lr_step_every=cfg.get("lr_step_every", 200),
        kl_w=cfg.get("kl_w", 1e-2),
        kl_anneal_start=cfg.get("kl_anneal_start", 0),
        kl_anneal_end=cfg.get("kl_anneal_end", 5000),
        dist_w=cfg.get("dist_w", 0.1),
        condition_dropout=cfg.get("condition_dropout", 0.8),
        teacher_iters=cfg.get("teacher_iters", 10000),
        ramping_iters=cfg.get("ramping_iters", 10000),
        student_iters=cfg.get("student_iters", 20000),
    )

    set_seed(args.seed)
    cnt_norm = dict(np.load(args.cnt_norm))
    src = dict(np.load(args.src_features))
    cha = dict(np.load(args.cha_features))
    actions = args.target_actions
    if actions is None:
        actions = sorted(set(int(a) for a in src["action_label"]))

    trainer = CVAETrainer(
        tc,
        src_cnt=src["cnt"], src_action=src["action_label"],
        src_range_starts=src["range_starts"], src_range_stops=src["range_stops"],
        cha_cnt=cha["cnt"], cha_encoded=cha["encoded"],
        cha_action=cha["action_label"],
        cha_range_starts=cha["range_starts"], cha_range_stops=cha["range_stops"],
        cnt_mean=cnt_norm["mean"], cnt_std=cnt_norm["std"],
        target_actions=actions, seed=args.seed)

    ensure_dirs(args.out)
    norm_path = os.path.join(args.out, "cvae_norm.npz")
    if not os.path.exists(norm_path):
        np.savez_compressed(norm_path, **trainer.norm_artifacts())
        print(f"wrote {norm_path}")

    writer = MetricsLogger(os.path.join(args.out, "log"))
    num_iters = args.num_iters or tc.num_iters
    log_every = int(get_config(args.config).get("log_every", 5))

    # Production loop (the measured fast path, bench.py --train-cvae):
    # host batch assembly (~90 MB of noise + the NN gather per iteration)
    # and the H2D upload run in a prefetch thread one batch ahead of the
    # device rollout, and metrics sync to host only at log points — the
    # naive assemble-upload-step-sync loop measured 62x slower on
    # relay-attached hosts (README, --sync-h2d row).
    import jax
    import jax.numpy as jnp

    def place(item):
        it, b = item
        if b is None:
            return it, None
        return it, tuple(jax.device_put(jnp.asarray(a)) for a in b)

    from ..data.dataset import prefetch_batches

    pending = []  # (iteration, device metrics) awaiting one batched fetch

    def flush_metrics():
        if not pending:
            return None
        its = [p[0] for p in pending]
        vals = np.asarray(jnp.stack([p[1] for p in pending]))  # ONE fetch
        pending.clear()
        for i, v in zip(its, vals):
            metrics = trainer.metrics_dict(i, v)
            writer.add_scalars(metrics, i)
        return metrics

    print(f"training {num_iters} iterations "
          "(prefetched device-placed batches, metrics synced every "
          f"{log_every} iters)")
    for it, batch in prefetch_batches(trainer.batch_stream(num_iters),
                                      place=place):
        if batch is None:
            continue
        m = trainer.step_placed(it, batch)
        pending.append((it, m))
        if (it + 1) % log_every == 0:
            metrics = flush_metrics()
            sys.stdout.write(
                "\riter %7d cnt %.3f enc %.3f kl %.3f dist %.3f" % (
                    it + 1, metrics["cvae/cnt_loss"],
                    metrics["cvae/encoded_loss"], metrics["cvae/kl_loss"],
                    metrics["cvae/dist_loss"]))
            sys.stdout.flush()
        if (it + 1) % args.save_every == 0:
            flush_metrics()
            path = os.path.join(args.out, f"cvae_{it + 1:06d}.msgpack")
            save_checkpoint(path, {"cvae": trainer.params})
            print(f"\nsaved {path}")
    flush_metrics()
    path = os.path.join(args.out, f"cvae_{num_iters:06d}.msgpack")
    save_checkpoint(path, {"cvae": trainer.params})
    print(f"\nsaved {path}")
    writer.close()


if __name__ == "__main__":
    main()
