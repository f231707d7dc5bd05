"""CLI entry points mirroring the reference's two scripts.

``canonswap_tpu.cli.main swap``   == inference_canswap.py (video face swap)
``canonswap_tpu.cli.main v2i``    == inference_v2i.py (motion drives image)
``canonswap_tpu.cli.main multi``  == multi-face variant of swap
    (pipelines/swap_multi.py; per-face tracked crops, shared parse pass)
``canonswap_tpu.cli.main stream`` == 3-stage threaded streaming pipeline
    (pipelines/streaming.py; decode / device compute / encode overlap)

Flags mirror ArgumentConfig with the reference's -s/-t/-o aliases
(inference_canswap.py:36, argument_config.py:16-18).  argparse is used
because tyro is not available in this environment; the config surface is the
same dataclass either way.
"""

from __future__ import annotations

import argparse
import dataclasses
import os.path as osp
import sys

from canonswap_tpu.configs.pipeline_config import (
    ArgumentConfig,
    CropConfig,
    InferenceConfig,
    partial_fields,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="canonswap-tpu")
    sub = p.add_subparsers(dest="mode", required=True)
    for mode in ("swap", "v2i", "multi", "stream"):
        sp = sub.add_parser(mode)
        sp.add_argument("-s", "--source", required=True,
                        help="source portrait (identity)")
        sp.add_argument("-t", "--driving", required=True,
                        help="target/driving video or image")
        sp.add_argument("-o", "--output-dir", default="results/")
        for f in dataclasses.fields(ArgumentConfig):
            if f.name in ("source", "driving", "output_dir"):
                continue
            arg = "--" + f.name.replace("_", "-")
            if f.type == "bool" or isinstance(f.default, bool):
                sp.add_argument(
                    arg, type=lambda v: v.lower() in ("1", "true", "yes"),
                    default=f.default,
                )
            elif f.default is None:
                sp.add_argument(arg, default=None)
            else:
                sp.add_argument(arg, type=type(f.default), default=f.default)
    return p


def fast_check_args(args: ArgumentConfig):
    if not osp.exists(args.source):
        raise FileNotFoundError(f"source info not found: {args.source}")
    if not osp.exists(args.driving):
        raise FileNotFoundError(f"driving info not found: {args.driving}")


def main(argv=None):
    ns = build_parser().parse_args(argv)
    kwargs = {k: v for k, v in vars(ns).items() if k != "mode"}
    args = ArgumentConfig(**kwargs)
    fast_check_args(args)

    inference_cfg = partial_fields(InferenceConfig, dataclasses.asdict(args))
    crop_cfg = partial_fields(CropConfig, dataclasses.asdict(args))
    # entry-point overrides matching the reference (inference_canswap.py:56-58)
    inference_cfg.flag_crop_driving_video = args.flag_crop_driving_video
    if args.debug_nans:
        # per-primitive NaN checker must be set before any jit traces
        from canonswap_tpu.utils.sanitize import enable_debug_nans

        enable_debug_nans()

    from canonswap_tpu.pipelines.session import FaceSwapSession

    session = FaceSwapSession(inference_cfg, crop_cfg,
                              fast_init=args.fast_init)
    if ns.mode == "swap":
        from canonswap_tpu.pipelines import swap_e2e

        swap_e2e.execute(session, args)
    elif ns.mode == "v2i":
        from canonswap_tpu.pipelines import swap_v2i

        swap_v2i.execute(session, args)
    elif ns.mode == "multi":
        from canonswap_tpu.pipelines import swap_multi

        swap_multi.execute(session, args)
    else:
        from canonswap_tpu.pipelines import streaming

        streaming.execute(session, args)


if __name__ == "__main__":
    main(sys.argv[1:])
