"""Dataset feature exports for the CVAE stage.

Two subcommands:
  * cnt-norm  — dataset-wide context-feature statistics -> cnt_norm.npz
                (role of /root/reference/compute_cnt_norm.py)
  * character — per-character sliding-window encoded/cnt features ->
                <name>_feature.npz (role of collect_CVAE_feature_action.py)

Run:
  python -m mocha_sigasia2023_tpu.cli.collect_features cnt-norm \
      --data-dir datasets/mocha60 --gen-ckpt model_ours/pth/gen_125.pt

  python -m mocha_sigasia2023_tpu.cli.collect_features character \
      --data-dir datasets/mocha60 --gen-ckpt ... \
      --styles 17 --actions 3 4 6 7 11 --out CVAE_transformer/princess_feature.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax

from ..io.database import load_database
from ..models import GeneratorConfig
from ..runtime import features as rtf
from ..utils import get_config
from .characterize import DEFAULT_CONFIG, load_generator


def _common(ap):
    ap.add_argument("--config", default=DEFAULT_CONFIG)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--gen-ckpt", default=None)
    ap.add_argument("--random-init", action="store_true")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    ap_cn = sub.add_parser("cnt-norm")
    _common(ap_cn)
    ap_ch = sub.add_parser("character")
    _common(ap_ch)
    ap_ch.add_argument("--styles", type=int, nargs="+", required=True)
    ap_ch.add_argument("--actions", type=int, nargs="+", required=True)
    ap_ch.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    config = get_config(args.config)
    cfg = GeneratorConfig.from_dict(config["model"])
    params = load_generator(args, cfg)

    db = load_database(os.path.join(args.data_dir, "database.bin"))
    norm = dict(np.load(os.path.join(args.data_dir, "norm.npz")))

    if args.cmd == "cnt-norm":
        encoded, cnt, _, _ = rtf.encode_database(
            db, params, cfg, norm, window=60, step=20)
        stats = rtf.compute_cnt_norm(encoded, cnt)
        out = os.path.join(args.data_dir, "cnt_norm.npz")
        np.savez_compressed(out, mean=stats["mean"], std=stats["std"])
        print(f"wrote {out} over {len(cnt)} windows")
    else:
        feats = rtf.collect_character_features(
            db, params, cfg, norm,
            style_labels=args.styles, action_labels=args.actions)
        np.savez_compressed(args.out, **feats)
        print(f"wrote {args.out}: {feats['encoded'].shape[0]} windows, "
              f"{len(feats['range_starts'])} clips")


if __name__ == "__main__":
    main()
