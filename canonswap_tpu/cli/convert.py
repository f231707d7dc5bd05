"""Checkpoint conversion CLI: torch -> JAX.

Converts the reference's checkpoint files into this framework's .npz format
(runtime/checkpoint.py) so inference hosts never need torch:

  # the combined generator checkpoint (can_swap_e2e.py:87-100)
  python -m canonswap_tpu.cli.convert combined combined_weights.pth out.npz

  # the pickled ArcFace module (can_swap_e2e.py:82-85)
  python -m canonswap_tpu.cli.convert arcface arcface_checkpoint.tar arc.npz

  # the stitching/retargeting checkpoint (helper.py:157-181)
  python -m canonswap_tpu.cli.convert stitching stitching_retargeting_module.pth s.npz
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="canonswap-tpu-convert")
    ap.add_argument("kind", choices=["combined", "arcface", "stitching"])
    ap.add_argument("src", help="torch checkpoint path (.pth/.tar)")
    ap.add_argument("dst", help="output .npz path")
    ns = ap.parse_args(argv)

    import torch

    from canonswap_tpu.runtime import checkpoint as CK
    from canonswap_tpu.runtime import weights as W

    if ns.kind == "combined":
        tree = W.load_torch_checkpoint(ns.src)
    elif ns.kind == "arcface":
        # whole pickled nn.Module: instantiate-by-unpickling, read layer
        # depths from the module, convert the state_dict
        module = torch.load(ns.src, map_location="cpu", weights_only=False)
        sd = W.strip_prefixes(W.to_numpy_state_dict(module.state_dict()))
        layers = tuple(
            len(getattr(module, f"layer{i}")) for i in range(1, 5)
        )
        print(f"ArcFace layer depths from pickle: {layers}")
        tree = W.convert_arcface(sd, layers=layers)
    else:
        ckpt = torch.load(ns.src, map_location="cpu", weights_only=False)
        ckpt = {
            k: W.to_numpy_state_dict(v) if hasattr(v, "items") is False else {
                kk: vv.detach().cpu().numpy() for kk, vv in v.items()
            }
            for k, v in ckpt.items()
        }
        tree = W.convert_stitching_checkpoint(ckpt)

    CK.save_npz(ns.dst, tree)
    print(f"Converted {ns.src} -> {ns.dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
