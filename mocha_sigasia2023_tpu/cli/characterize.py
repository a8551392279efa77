"""End-to-end characterization demo (the reference's test_fullframework.py).

Given a source BVH and a character BVH (plus generator/CVAE checkpoints and
normalization artifacts), re-synthesizes the source motion in the
character's style and writes Src_/Ours_ BVHs.  All heavy stages run as
jitted XLA programs: batched window featurization+encode, then one scanned
per-frame step (context match -> decode -> root integration -> foot IK).

Checkpoints: accepts either our orbax/msgpack checkpoints or the reference
torch files (model_ours/pth/gen_125.pt, cvae_020000.pt) via models.convert.
With --random-init it runs the full pipeline on freshly initialized weights
(smoke/demo mode when no checkpoint is available).

Run: python -m mocha_sigasia2023_tpu.cli.characterize \
         --src bvh/Loco_Walk_Neutral_AverageJoe_001.bvh \
         --cha bvh/Loco_Walk_Neutral_Princess_002.bvh \
         --gen-ckpt model_ours/pth/gen_125.pt \
         [--cvae-ckpt .../cvae_020000.pt --cvae-norm .../cvae_norm.npz] \
         --norm datasets/mocha60/norm.npz --cnt-norm datasets/mocha60/cnt_norm.npz \
         --out ./results
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..io import bvh
from ..models import CVAEConfig, GeneratorConfig, convert
from ..models.cvae import init_cvae
from ..models.generator import init_generator
from ..runtime import export as rtexport
from ..runtime import features as rtf
from ..runtime import stream as rts
from ..runtime.stream import IKConfig, RuntimeConsts
from ..utils import ensure_dirs, get_config

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CONFIG = os.path.join(_HERE, "configs", "config.yaml")


def load_generator(args, cfg: GeneratorConfig):
    if args.gen_ckpt:
        if args.gen_ckpt.endswith(".pt"):
            params = convert.load_reference_generator_checkpoint(
                args.gen_ckpt, use_ema=True,
                encoder_depth=cfg.encoder_depth, decoder_depth=cfg.decoder_depth)
        else:
            from ..train.checkpoint import load_checkpoint, restore_like

            template = init_generator(jax.random.PRNGKey(0), cfg)
            params = restore_like(
                template, load_checkpoint(args.gen_ckpt)["gen_ema"])
        return jax.tree.map(jnp.asarray, params)
    if not args.random_init:
        raise SystemExit("provide --gen-ckpt or pass --random-init")
    return init_generator(jax.random.PRNGKey(1777), cfg)


def load_cvae(args, cvae_cfg: CVAEConfig):
    if args.cvae_ckpt:
        if args.cvae_ckpt.endswith(".pt"):
            sd = convert.load_torch_file(args.cvae_ckpt)
            params = convert.cvae_from_torch(sd, depth=cvae_cfg.depth)
        else:
            from ..train.checkpoint import load_checkpoint, restore_like

            template = init_cvae(jax.random.PRNGKey(0), cvae_cfg)
            params = restore_like(
                template, load_checkpoint(args.cvae_ckpt)["cvae"])
        return jax.tree.map(jnp.asarray, params)
    if args.random_init:
        return init_cvae(jax.random.PRNGKey(7), cvae_cfg)
    return None


def build_consts(norm, cnt_norm, cvae_norm, cha_feats) -> RuntimeConsts:
    cnt_mean = cnt_norm["mean"]
    cnt_std = cnt_norm["std"].copy()
    if cvae_norm is not None:
        # temp-weighted stds (test_fullframework.py:89-92)
        temp_weight = cvae_norm["std_weight"]
        cnt_std = cnt_std / temp_weight
        src_cnt_mean = cvae_norm["src_cnt_mean"]
        src_cnt_std = cvae_norm["src_cnt_std"] / temp_weight
        enc_mean = cvae_norm["cha_encoded_mean"]
        enc_std = cvae_norm["cha_encoded_std"] / temp_weight
    else:
        src_cnt_mean, src_cnt_std = cnt_mean, cnt_std
        enc_mean = cha_feats["encoded"].mean(axis=0)
        enc_std = cha_feats["encoded"].std(axis=0) + 1e-6

    cha_cnt_flat = jnp.asarray(
        ((cha_feats["cnt"] - cnt_mean[None]) / cnt_std[None]).reshape(
            len(cha_feats["cnt"]), -1), jnp.float32)
    return RuntimeConsts(
        Y_mean=jnp.asarray(norm["Y_mean"]),
        Y_std=jnp.asarray(norm["Y_std"]),
        cha_encoded=jnp.asarray(cha_feats["encoded"]),
        cha_cnt_flat=cha_cnt_flat,
        cha_cnt_sq=jnp.sum(cha_cnt_flat ** 2, axis=-1),
        cnt_mean=jnp.asarray(cnt_mean, jnp.float32),
        cnt_std=jnp.asarray(cnt_std, jnp.float32),
        src_cnt_mean=jnp.asarray(src_cnt_mean, jnp.float32),
        src_cnt_std=jnp.asarray(src_cnt_std, jnp.float32),
        cha_encoded_mean=jnp.asarray(enc_mean, jnp.float32),
        cha_encoded_std=jnp.asarray(enc_std, jnp.float32),
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=DEFAULT_CONFIG)
    ap.add_argument("--src", default=None, help="source BVH")
    ap.add_argument("--src-dir", default=None,
                    help="characterize EVERY *.bvh under this directory as "
                         "parallel batched streams on one chip (the "
                         "throughput path, runtime.stream.make_batch_runner)"
                         "; writes one Src_/Ours_/CM_ triple per clip")
    ap.add_argument("--cha", required=True, help="character BVH")
    ap.add_argument("--gen-ckpt", default=None)
    ap.add_argument("--cvae-ckpt", default=None)
    ap.add_argument("--cvae-norm", default=None, help="cvae_norm.npz")
    ap.add_argument("--norm", default=None, help="norm.npz (X/Y stats)")
    ap.add_argument("--cnt-norm", default=None, help="cnt_norm.npz")
    ap.add_argument("--out", default="./results")
    ap.add_argument("--random-init", action="store_true",
                    help="run with fresh weights (smoke/demo mode)")
    ap.add_argument("--deterministic", action="store_true",
                    help="deterministic CVAE sampling")
    ap.add_argument("--no-ik", action="store_true")
    ap.add_argument("--seed", type=int, default=1777)
    ap.add_argument("--viz", default=None, metavar="FILE.{mp4,gif}",
                    help="render src/cm/trans/ik side by side to a video "
                         "(.mp4 needs ffmpeg; .gif uses pillow)")
    ap.add_argument("--production", action="store_true",
                    help="serving mode: skip the NN comparison stream "
                         "(CM output = CVAE output)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 decoder/CVAE matmuls (f32 pose math)")
    ap.add_argument("--tchunk", type=int, default=0, metavar="FRAMES",
                    help="--src-dir only: stream the featurized inputs to "
                         "the device in time chunks of this many frames "
                         "(runtime.stream runner.chunked) — bounds HBM "
                         "residency to ~2 chunks for long/many-clip "
                         "batches; 0 = monolithic (whole batch resident)")
    args = ap.parse_args(argv)
    if args.tchunk and not args.src_dir:
        ap.error("--tchunk applies to the --src-dir batch path")
    if (args.src is None) == (args.src_dir is None):
        ap.error("provide exactly one of --src or --src-dir")
    if args.src_dir and args.viz:
        ap.error("--viz is a single-clip option; use it with --src")

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    cfg_dict = get_config(args.config)
    cfg = GeneratorConfig.from_dict(cfg_dict["model"])
    cvae_d = cfg_dict.get("cvae", {})
    cvae_cfg = CVAEConfig(
        output_seq=cfg.num_tokens,
        latent_dim=cvae_d.get("latent_dim", 256),
        depth=cvae_d.get("depth", 2),
        nheads=cvae_d.get("nheads", 4),
        feedforward_dim=cvae_d.get("feedforward_dim", 512))
    rt = cfg_dict.get("runtime", {})
    ik_cfg = IKConfig(enabled=not args.no_ik,
                      **{k: v for k, v in rt.get("ik", {}).items()
                         if k != "enabled"})

    params = load_generator(args, cfg)
    cvae_params = load_cvae(args, cvae_cfg)

    if args.src_dir:
        import glob as globmod
        src_paths = sorted(globmod.glob(
            os.path.join(args.src_dir, "**", "*.bvh"), recursive=True))
        if not src_paths:
            raise SystemExit(f"no .bvh files under {args.src_dir}")
    else:
        src_paths = [args.src]
    cha_bvh = bvh.load(args.cha)
    src_bvhs = [bvh.load(p) for p in src_paths]
    for p, b in zip(src_paths[1:], src_bvhs[1:]):
        # mixed skeletons would otherwise die in an opaque stack/gather
        # shape error (or, worse, write BVHs with the wrong hierarchy)
        if (list(b["names"]) != list(src_bvhs[0]["names"])
                or not np.array_equal(np.asarray(b["parents"]),
                                      np.asarray(src_bvhs[0]["parents"]))):
            raise SystemExit(
                f"{p}: skeleton differs from {src_paths[0]} — all clips "
                "in --src-dir must share one hierarchy (joint names and "
                "parents)")

    if args.norm:
        norm = dict(np.load(args.norm))
    else:
        # derive stats from the character clip (demo mode without a dataset)
        from ..data.dataset import compute_norm_stats
        from ..data import preprocess as pre
        from ..data.windows import window_features
        from ..data.dataset import window_xy_features

        feats = pre.featurize_clip_jit(cha_bvh)
        w = window_features(feats, rt.get("window", 60), 10, padded=False)
        X, Y, root = window_xy_features(
            w["rotations"], w["positions"], w["velocities"],
            w["angular_velocities"], feats["bone_parents"])
        norm = compute_norm_stats(np.asarray(X), np.asarray(Y), np.asarray(root))
        print("note: no --norm given; derived stats from the character clip")

    window = int(rt.get("window", 60))
    print("featurizing + encoding the character clip (one jitted "
          "program, runtime.features.clip_stream_features_device) ...")
    cha_feats = rtf.clip_stream_features_device(cha_bvh, params, cfg, norm,
                                                window=window)
    cha_feats = {k: (np.asarray(v) if k != "bone_names" else v)
                 for k, v in cha_feats.items()}

    if args.cnt_norm:
        cnt_norm = dict(np.load(args.cnt_norm))
    else:
        cnt_norm = rtf.compute_cnt_norm(cha_feats["encoded"], cha_feats["cnt"])
        print("note: no --cnt-norm given; derived from the character clip")
    cvae_norm = dict(np.load(args.cvae_norm)) if args.cvae_norm else None

    consts = build_consts(norm, cnt_norm, cvae_norm, cha_feats)
    parents = np.concatenate([[-1], np.asarray(src_bvhs[0]["parents"]) + 1])

    compute_dtype = jnp.bfloat16 if args.bf16 else None
    if args.bf16:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        if cvae_params is not None:
            cvae_params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), cvae_params)

    ensure_dirs(args.out)
    names = list(src_bvhs[0]["names"])
    cha_name = os.path.basename(args.cha)

    def write_outputs(src_path, o):
        src_name = os.path.basename(src_path)
        src_out = os.path.join(args.out, "Src_" + src_name)
        ours_out = os.path.join(
            args.out, "Ours_" + src_name[:-4] + "_To_" + cha_name)
        cm_out = os.path.join(
            args.out, "CM_" + src_name[:-4] + "_To_" + cha_name)
        rtexport.save_characterized_bvh(
            src_out, o["src_pos"], o["src_rot"], parents, names)
        rtexport.save_characterized_bvh(
            ours_out, o["ik_pos"], o["ik_rot"], parents, names)
        rtexport.save_characterized_bvh(
            cm_out, o["cm_pos"], o["cm_rot"], parents, names)
        print(f"wrote {src_out}\nwrote {ours_out}\nwrote {cm_out}")

    if args.src_dir:
        # batched throughput path (the program bench.py --e2e measures):
        # featurize+encode ALL clips in one jitted dispatch per distinct
        # clip length (runtime.features.batch_stream_features_ragged —
        # the per-clip dispatch form measured 6.0k frames/s-class vs
        # 10.8k+ for the batched program), then run every clip as a
        # parallel stream of ONE scanned program; shorter clips ride
        # edge-padded and outputs are trimmed back per clip
        # emit_cnt=False: the runner re-derives cnt from encoded (exact),
        # halving per-frame stream inputs resident in HBM
        frame0, xs, lengths, n_groups = rtf.batch_stream_features_ragged(
            src_bvhs, params, cfg, norm, window=window, emit_cnt=False)
        print(f"featurize+encode: {n_groups} device dispatch(es) for "
              f"{len(src_paths)} clips (one jitted "
              "batch_stream_features_device program per distinct length)")
        print(f"characterizing {len(src_paths)} clips "
              f"({sum(lengths)} frames) as parallel streams ...")
        # the CLI process owns the global x64 flag the f64 root
        # accumulators need — flip it here (where the runner would),
        # silently
        jax.config.update("jax_enable_x64", True)
        runner = rts.make_batch_runner(
            params, cfg, cvae_params, cvae_cfg, consts, parents,
            contact_bones=tuple(rt.get("contact_bones", (5, 24))),
            ik=ik_cfg, dt=rt.get("dt", 1.0 / 60.0),
            deterministic=args.deterministic,
            compute_cm=not args.production, compute_dtype=compute_dtype,
            root_dtype=jnp.float64)
        keys = jax.random.split(jax.random.PRNGKey(args.seed),
                                len(src_paths))
        if args.tchunk:
            # long/many-clip batches: fetch the featurized streams to
            # host once, then runner.chunked uploads one time slice at a
            # time — device residency is ~2 chunks of xs instead of the
            # whole (T, S, tok, dim) stack (outputs are identical to the
            # monolithic runner; the scan carry crosses chunks unchanged)
            frame0 = jax.tree.map(np.asarray, frame0)
            xs = jax.tree.map(np.asarray, xs)
            out = jax.tree.map(np.asarray, runner.chunked(
                frame0, xs, keys, tchunk=args.tchunk))
        else:
            out = jax.tree.map(np.asarray, runner(frame0, xs, keys))
        for i, (p, L) in enumerate(zip(src_paths, lengths)):
            write_outputs(p, {k: v[:L, i] for k, v in out.items()})
        return out

    src_feats = rtf.clip_stream_features_device(src_bvhs[0], params, cfg,
                                                norm, window=window)
    print(f"characterizing {len(src_feats['encoded'])} frames ...")
    jax.config.update("jax_enable_x64", True)  # CLI owns the flag (f64 roots)
    out = rts.characterize_clip(
        params, cfg, cvae_params, cvae_cfg, consts, parents, src_feats,
        contact_bones=tuple(rt.get("contact_bones", (5, 24))), ik=ik_cfg,
        dt=rt.get("dt", 1.0 / 60.0), deterministic=args.deterministic,
        compute_cm=not args.production, compute_dtype=compute_dtype,
        key=jax.random.PRNGKey(args.seed))
    write_outputs(args.src, out)

    if args.viz:
        import matplotlib
        matplotlib.use("Agg")
        from ..viz import animation_plot

        contact_bones = np.asarray(rt.get("contact_bones", (5, 24)))
        anims = [
            [out["src_pos"], out["src_rot"], out["contact"], contact_bones, parents],
            [out["cm_pos"], out["cm_rot"], out["contact"], contact_bones, parents],
            [out["trans_pos"], out["trans_rot"], out["contact"], contact_bones, parents],
            [out["ik_pos"], out["ik_rot"], out["contact"], contact_bones, parents],
        ]
        animation_plot(anims, save_path=args.viz, show=False)
        print(f"wrote {args.viz}")
    return out


if __name__ == "__main__":
    main()
