"""AOT cost analysis of the monolithic training step across batch sizes.

Explains the measured batch-scaling curve of ``bench.py --train``
(windows/s: 523 @ B=64, 443 @ 128, 251 @ 256 on one v5e) without burning
bench time: lowers + compiles the shipped train step for each batch size
and prints the executable's FLOP count, logical bytes accessed, and temp
(activation) memory from XLA's own cost model.

Measured on the v5e terminal (f32, tail-barrier monolithic step):

    B=64 : 2197 GFLOP, 220 GB accessed, temp 5.7 GB
    B=256: 10478 GFLOP (4.77x, not 4x), 750 GB (3.4x), temp 14.4 GB

Reading: at B=256 the step's activations approach the chip's 16 GB HBM,
so XLA breaks fusions / auto-rematerializes (the super-linear FLOP and
transcendental growth) and the measured step lands at ~735 GB/s of real
HBM traffic — ~90% of v5e peak bandwidth.  The step is memory-bound
there, which is why bf16 forwards do not help at B=256 (259 vs 251 w/s)
and explicit ``--remat`` makes it worse (203 w/s: recompute on top of a
bandwidth bound).  B=64 runs mostly fused (logical 220 GB / 0.122 s
step would be 1.8 TB/s — far above peak, i.e. most accesses never leave
registers/VMEM) at ~18 TFLOP/s f32.  Batch 64 — the reference's own
config (configs/config.yaml:49) — is the throughput-optimal point on
this chip; scale batch by adding chips on the data mesh axis instead.

Run: python scripts/train_cost_probe.py [B ...]   (default 64 256)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from mocha_sigasia2023_tpu.utils import enable_compilation_cache
from mocha_sigasia2023_tpu.utils.config import get_config
from mocha_sigasia2023_tpu.train.trainer import GeneratorTrainer


def probe(batch_sizes):
    enable_compilation_cache()
    config = get_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "mocha_sigasia2023_tpu", "configs", "config.yaml"))
    T, J = 60, 25
    for B in batch_sizes:
        trainer = GeneratorTrainer(config, steps_per_epoch=100)
        r = np.random.RandomState(0)
        batch = {
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
        key = jax.random.PRNGKey(0)
        comp = trainer._train_step.lower(
            trainer.state, batch, batch, norm, key).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out = {
            "B": B,
            "gflops": round(ca.get("flops", 0) / 1e9, 2),
            "gbytes_accessed": round(ca.get("bytes accessed", 0) / 1e9, 3),
            "transcendentals": ca.get("transcendentals", 0),
        }
        try:
            mem = comp.memory_analysis()
            out["temp_MB"] = round(mem.temp_size_in_bytes / 1e6, 1)
            out["arg_out_MB"] = round(
                (mem.argument_size_in_bytes + mem.output_size_in_bytes) / 1e6, 1)
        except Exception as e:  # memory_analysis is backend-dependent
            out["mem_err"] = str(e)
        print(json.dumps(out))


if __name__ == "__main__":
    probe([int(a) for a in sys.argv[1:]] or [64, 256])
