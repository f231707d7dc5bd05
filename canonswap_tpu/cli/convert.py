"""Checkpoint conversion CLI: torch -> JAX.

Converts the reference's checkpoint files into this framework's .npz format
(runtime/checkpoint.py) so inference hosts never need torch:

  # the combined generator checkpoint (can_swap_e2e.py:87-100)
  python -m canonswap_tpu.cli.convert combined combined_weights.pth out.npz

  # the pickled ArcFace module (can_swap_e2e.py:82-85)
  python -m canonswap_tpu.cli.convert arcface arcface_checkpoint.tar arc.npz

  # the stitching/retargeting checkpoint (helper.py:157-181)
  python -m canonswap_tpu.cli.convert stitching stitching_retargeting_module.pth s.npz

  # insightface ONNX sidecars (model_zoo/scrfd.py:72-110, landmark.py:31-49,
  # arcface_onnx.py:14-38) -> flax weights, topology-mapped (runtime/onnx_map)
  python -m canonswap_tpu.cli.convert det_onnx det_10g.onnx det.npz
  python -m canonswap_tpu.cli.convert lmk106_onnx 2d106det.onnx lmk106.npz
  python -m canonswap_tpu.cli.convert lmk203_onnx landmark.onnx lmk203.npz
  python -m canonswap_tpu.cli.convert arcface_onnx glintr100.onnx arc.npz
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="canonswap-tpu-convert")
    ap.add_argument(
        "kind",
        choices=["combined", "arcface", "stitching", "det_onnx",
                 "lmk106_onnx", "lmk203_onnx", "arcface_onnx"],
    )
    ap.add_argument("src", help="torch checkpoint (.pth/.tar) or .onnx path")
    ap.add_argument("dst", help="output .npz path")
    ns = ap.parse_args(argv)

    from canonswap_tpu.runtime import checkpoint as CK

    if ns.kind.endswith("_onnx"):
        import jax.numpy as jnp

        from canonswap_tpu.runtime.onnx_map import convert_onnx_for

        if ns.kind == "det_onnx":
            from canonswap_tpu.models.scrfd import SCRFD

            tree = convert_onnx_for(SCRFD(), ns.src,
                                    jnp.zeros((1, 640, 640, 3)))
        elif ns.kind == "arcface_onnx":
            from canonswap_tpu.models.arcface import ArcFaceResNet

            tree = convert_onnx_for(ArcFaceResNet(), ns.src,
                                    jnp.zeros((1, 112, 112, 3)))
        else:
            from canonswap_tpu.models.landmark import LandmarkNet

            pts = 106 if ns.kind == "lmk106_onnx" else 203
            size = 192 if pts == 106 else 224
            tree = convert_onnx_for(LandmarkNet(num_points=pts), ns.src,
                                    jnp.zeros((1, size, size, 3)))
        CK.save_npz(ns.dst, tree)
        print(f"Converted {ns.src} -> {ns.dst}")
        return

    import torch

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
