"""Build the packed motion database from a directory of BVH files.

Pipeline parity: /root/reference/preprocess/generate_database_bin.py —
per clip x {original, mirrored}: parse -> featurize (root-bone synthesis,
velocities, contacts @0.2 m/s) -> append; style/action labels parsed from
filenames against the dataset vocabularies; packed to database.bin.

Run: python -m mocha_sigasia2023_tpu.cli.generate_database \
         --bvh-dir ./bvh --out ./datasets/mocha60 \
         [--dataset-config configs/dataset.yaml]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

from ..data.preprocess import featurize_clip_jit
from ..io import bvh
from ..io.database import save_database
from ..utils import ensure_dirs, get_config

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_DATASET_CONFIG = os.path.join(_HERE, "configs", "dataset.yaml")


def label_from_name(stem: str, vocab) -> int:
    """First vocabulary entry contained in the filename
    (generate_database_bin.py:84-94)."""
    for i, name in enumerate(vocab):
        if name in stem:
            return i
    raise ValueError(f"no label in {stem!r}")


def build_database(bvh_files, style_names, action_names, *,
                   contact_velocity_threshold=0.2, mirror=True, fps=60.0):
    pos, vel, rot, ang, con = [], [], [], [], []
    starts, stops, styles, actions = [], [], [], []
    parents = None
    variants = [False, True] if mirror else [False]
    for i, path in enumerate(bvh_files):
        stem = Path(path).stem
        style = label_from_name(stem, style_names)
        action = label_from_name(stem, action_names)
        data = bvh.load(str(path))
        for mirrored in variants:
            print(f"[{i + 1}/{len(bvh_files)}] {stem}"
                  f"{'_Mirrored' if mirrored else ''}")
            f = featurize_clip_jit(
                data, mirror=mirrored,
                contact_velocity_threshold=contact_velocity_threshold,
                fps=fps)
            pos.append(np.asarray(f["positions"], np.float32))
            vel.append(np.asarray(f["velocities"], np.float32))
            rot.append(np.asarray(f["rotations"], np.float32))
            ang.append(np.asarray(f["angular_velocities"], np.float32))
            con.append(np.asarray(f["contacts"], np.uint8))
            off = 0 if not stops else stops[-1]
            starts.append(off)
            stops.append(off + len(pos[-1]))
            styles.append(style)
            actions.append(action)
            parents = f["bone_parents"]
    return {
        "bone_positions": np.concatenate(pos),
        "bone_velocities": np.concatenate(vel),
        "bone_rotations": np.concatenate(rot),
        "bone_angular_velocities": np.concatenate(ang),
        "bone_parents": np.asarray(parents, np.int32),
        "range_starts": np.asarray(starts, np.int32),
        "range_stops": np.asarray(stops, np.int32),
        "style_labels": np.asarray(styles, np.int32),
        "action_labels": np.asarray(actions, np.int32),
        "contact_states": np.concatenate(con),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bvh-dir", required=True)
    ap.add_argument("--out", required=True, help="output dataset directory")
    ap.add_argument("--dataset-config", default=DEFAULT_DATASET_CONFIG)
    ap.add_argument("--contact-threshold", type=float, default=0.2)
    ap.add_argument("--no-mirror", action="store_true")
    ap.add_argument("--name", default="database.bin")
    args = ap.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    cfg = get_config(args.dataset_config)
    files = sorted(
        p for p in Path(args.bvh_dir).rglob("*.bvh") if p.name != "rest.bvh")
    if not files:
        raise SystemExit(f"no .bvh files under {args.bvh_dir}")
    db = build_database(
        files, cfg["mocha_style_names"], cfg["mocha_action_names"],
        contact_velocity_threshold=args.contact_threshold,
        mirror=not args.no_mirror)
    ensure_dirs(args.out)
    out_path = os.path.join(args.out, args.name)
    save_database(out_path, db)
    print(f"wrote {out_path}: {db['bone_positions'].shape[0]} frames, "
          f"{len(db['range_starts'])} clips")


if __name__ == "__main__":
    main()
