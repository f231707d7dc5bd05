"""Training CLI: self-reconstruction fine-tuning of the full generator stack.

The reference ships no trainer (SURVEY.md §2); this driver makes the
framework trainable end-to-end on TPU: frames are sampled from videos/images
in a data directory, batched at fixed shape, sharded dp over the mesh
(optionally tp via --model-axis), stepped with optax adam, checkpointed as
.npz (see runtime/checkpoint.py).

Usage:
  python -m canonswap_tpu.cli.train --data-dir frames/ --steps 1000 \
      --batch 8 --model-axis 1 --ckpt-out ckpt.npz [--resume ckpt.npz]
"""

from __future__ import annotations

import argparse
import glob
import os.path as osp

import numpy as np

import jax
import jax.numpy as jnp


def iter_batches(data_dir: str, batch: int, size: int, seed: int = 0):
    """Infinite fixed-shape frame batches from images/videos in a directory."""
    import cv2

    from canonswap_tpu.utils import io as IO
    from canonswap_tpu.utils import video as V

    paths = sorted(
        p for p in glob.glob(osp.join(data_dir, "*"))
        if IO.is_image(p) or IO.is_video(p)
    )
    if not paths:
        raise FileNotFoundError(f"no images/videos in {data_dir}")
    frames = []
    for p in paths:
        if IO.is_image(p):
            frames.append(cv2.resize(IO.load_image_rgb(p), (size, size)))
        else:
            for f in V.load_video(p, n_frames=256):
                frames.append(cv2.resize(f, (size, size)))
    frames = np.stack(frames).astype(np.float32) / 255.0
    rng = np.random.default_rng(seed)
    while True:
        idx = rng.integers(0, len(frames), batch)
        yield frames[idx]


def main(argv=None):
    ap = argparse.ArgumentParser(prog="canonswap-tpu-train")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--model-axis", type=int, default=1)
    ap.add_argument("--ckpt-out", default="canonswap_ckpt.npz")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--tiny", action="store_true", help="tiny config (tests)")
    ap.add_argument("--log-every", type=int, default=20)
    ns = ap.parse_args(argv)

    from canonswap_tpu.configs.model_config import CANONICAL, TINY
    from canonswap_tpu.parallel import mesh as M
    from canonswap_tpu.runtime import checkpoint as CK
    from canonswap_tpu.runtime import core as C
    from canonswap_tpu.runtime import train as T
    from canonswap_tpu.utils.rlog import log
    from canonswap_tpu.utils.timing import StageTimer

    cfg = TINY if ns.tiny else CANONICAL
    core = C.CanonSwapCore(cfg)
    tx = T.make_optimizer(ns.lr)
    mesh = M.make_mesh(model=ns.model_axis)
    data_axis = mesh.shape["data"]
    if ns.batch % data_axis:
        ns.batch = ((ns.batch + data_axis - 1) // data_axis) * data_axis
        log(f"Rounded batch up to {ns.batch} (data axis = {data_axis})")
    state = T.init_sharded_state(core, tx, mesh, jax.random.PRNGKey(0))
    if ns.resume:
        params = CK.load_npz(ns.resume)
        params = jax.device_put(params, M.param_sharding(params, mesh))
        state = T.TrainState(params, tx.init(params), state.step)
        log(f"Resumed from {ns.resume}")

    step_fn = T.make_sharded_train_step(core, tx)
    timer = StageTimer()
    batches = iter_batches(ns.data_dir, ns.batch, cfg.input_size)

    # self-reconstruction uses a fixed random ID latent per run; a full
    # training recipe would feed ArcFace embeddings of the batch identities
    sid = M.shard_batch(
        jax.random.normal(jax.random.PRNGKey(1), (ns.batch, cfg.swap.latent_dim)),
        mesh,
    )

    for i in range(ns.steps):
        batch = M.shard_batch(jnp.asarray(next(batches)), mesh)
        with timer.stage("train_step", items=ns.batch):
            state, metrics = step_fn(state, batch, sid)
        if (i + 1) % ns.log_every == 0 or i == 0:
            jax.block_until_ready(metrics["loss"])
            log(
                f"step {i + 1}/{ns.steps} "
                f"loss={float(metrics['loss']):.4f} "
                f"l1={float(metrics['l1']):.4f}"
            )

    CK.save_npz(ns.ckpt_out, jax.device_get(state.params))
    log(f"Saved checkpoint to {ns.ckpt_out}")
    log(timer.report())


if __name__ == "__main__":
    main()
