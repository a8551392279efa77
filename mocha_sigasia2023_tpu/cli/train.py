"""Generator training CLI.

Flow parity: /root/reference/train.py — config snapshot into info/, two
independently-shuffled window streams (source & character), epoch loop with
checkpoints every save_every epochs, TensorBoard/JSONL scalars every
log_every iterations.

Run: python -m mocha_sigasia2023_tpu.cli.train --config configs/config.yaml \
         [--max-epochs N] [--data-parallel K]
"""

from __future__ import annotations

import argparse
import os
import shutil
import time

import numpy as np
import jax

from ..data.dataset import MotionDataset, iterate_batches, prefetch_batches
from ..parallel import make_mesh, shard_batch
from ..train.trainer import GeneratorTrainer
from ..utils import describe_params, ensure_dirs, get_config, set_seed
from ..utils.logging import MetricsLogger
from .characterize import DEFAULT_CONFIG


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=DEFAULT_CONFIG)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--data-parallel", type=int, default=None,
                    help="mesh data-axis size (default: all devices)")
    ap.add_argument("--resume", default=None, help="checkpoint to resume")
    args = ap.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    config = get_config(args.config)
    if args.data_dir:
        config["data_dir"] = args.data_dir
    if args.max_epochs is not None:
        config["max_epochs"] = args.max_epochs
    if args.batch_size is not None:
        config["batch_size"] = args.batch_size

    main_dir = os.path.join(".", config["name"])
    model_dir = os.path.join(main_dir, "pth")
    tb_dir = os.path.join(main_dir, "log")
    info_dir = os.path.join(main_dir, "info")
    ensure_dirs([main_dir, model_dir, tb_dir, info_dir])
    shutil.copy(args.config, os.path.join(info_dir, "config.yaml"))

    seed = int(config.get("manualSeed", 1777))
    set_seed(seed)

    print("loading dataset ...")
    dataset = MotionDataset(config["data_dir"], "train")
    norm = {k: np.asarray(v) for k, v in dataset.norm.items()}
    batch_size = int(config["batch_size"])
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    print(f"{len(dataset)} windows, {steps_per_epoch} steps/epoch")

    # the data axis must divide the global batch: default to the largest
    # divisor of batch_size that fits the device count
    n_data = args.data_parallel
    if n_data is None:
        n_devices = len(jax.devices())
        n_data = max(d for d in range(1, n_devices + 1)
                     if batch_size % d == 0)
    mesh = make_mesh(n_data=n_data)
    print(f"mesh: data={mesh.shape['data']} model={mesh.shape['model']}")
    trainer = GeneratorTrainer(config, steps_per_epoch, mesh=mesh, seed=seed)

    # network repr + param counts (reference train.py:58-60 contract)
    with open(os.path.join(info_dir, "info-network"), "w") as f:
        state = trainer.state
        f.write(describe_params(state.params["gen"], "Generator") + "\n\n")
        f.write(describe_params(state.params["prj"], "Projector") + "\n")

    start_epoch = 0
    if args.resume:
        start_epoch = trainer.load(args.resume, resume=True)
        print(f"resumed from {args.resume} (epoch {start_epoch})")

    writer = MetricsLogger(os.path.join(tb_dir, "train"))
    log_every = int(config.get("log_every", 5))
    save_every = int(config.get("save_every", 25))
    key = jax.random.PRNGKey(seed)

    for epoch in range(start_epoch, int(config["max_epochs"])):
        t0 = time.time()
        # prefetch + sharded device placement one batch ahead of the step
        # (role of the reference's DataLoader(num_workers=4, pin_memory))
        place = lambda b: shard_batch(mesh, b)  # noqa: E731
        src_stream = prefetch_batches(
            iterate_batches(dataset, batch_size, shuffle=True,
                            seed=seed, epoch=epoch), place=place)
        cha_stream = prefetch_batches(
            iterate_batches(dataset, batch_size, shuffle=True,
                            seed=seed + 10_000, epoch=epoch), place=place)
        for it, (bs, bc) in enumerate(zip(src_stream, cha_stream)):
            key, sub = jax.random.split(key)
            metrics = trainer.train_step(bs, bc, norm, sub)
            if (it + 1) % log_every == 0:
                step = epoch * steps_per_epoch + it
                writer.add_scalars(
                    {k: float(v) for k, v in metrics.items()}, step)
        loss = float(metrics["gen/loss_total"])
        print(f"epoch {epoch + 1}/{config['max_epochs']} "
              f"loss_total={loss:.3f} ({time.time() - t0:.1f}s)")
        if (epoch + 1) % save_every == 0:
            path = trainer.save(model_dir, epoch + 1)
            print(f"saved {path}")
    trainer.save(model_dir, int(config["max_epochs"]))
    writer.close()


if __name__ == "__main__":
    main()
