"""Convert reference (PyTorch) checkpoints to framework msgpack checkpoints.

Accepts the reference trainer's gen_*.pt ({'gen','gen_ema','gen_opt'},
trainer.py:218-220) and the CVAE's cvae_*.pt (raw state_dict,
train_CVAE.py:283-285); writes torch-free msgpack pytrees loadable by
train.checkpoint / the characterize CLI.

Run: python -m mocha_sigasia2023_tpu.cli.convert_checkpoint \
         --kind gen model_ours/pth/gen_125.pt out/gen_125.msgpack
"""

from __future__ import annotations

import argparse

from ..models import convert
from ..train.checkpoint import save_checkpoint


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="reference .pt checkpoint")
    ap.add_argument("dst", help="output .msgpack path")
    ap.add_argument("--kind", choices=["gen", "cvae", "projector"],
                    default="gen")
    ap.add_argument("--encoder-depth", type=int, default=2)
    ap.add_argument("--decoder-depth", type=int, default=2)
    args = ap.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    obj = convert.load_torch_file(args.src)
    if args.kind == "gen":
        out = {
            "gen": convert.generator_from_torch(
                obj["gen"], args.encoder_depth, args.decoder_depth),
            "gen_ema": convert.generator_from_torch(
                obj["gen_ema"], args.encoder_depth, args.decoder_depth),
        }
    elif args.kind == "cvae":
        sd = obj if not isinstance(obj, dict) or "prior_net.mu_token" in obj \
            else obj.get("state_dict", obj)
        out = {"cvae": convert.cvae_from_torch(sd, depth=args.encoder_depth)}
    else:
        out = {"prj": convert.projector_from_torch(obj)}
    save_checkpoint(args.dst, out)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
