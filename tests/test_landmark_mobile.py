"""MobileLandmarkNet: the faithful coordinateReg-class trunk (VERDICT r3 #6).

The benchmarked landmark stage must reflect realistic FLOPs: the public
2d106det.onnx / landmark.onnx files are MobileNet-class (~1.3 M params,
well under 1 GFLOP/frame — reference consumers model_zoo/landmark.py:80-112,
human_landmark_runner.py:60-85).  These tests pin the native default trunk
to that cost class and check the runner decode geometry is unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonswap_tpu.models.landmark import (
    Landmark106Runner, Landmark203Runner, LandmarkNet, MobileLandmarkNet)


def test_mobile_trunk_cost_class():
    net = MobileLandmarkNet(num_points=203)
    x = jnp.zeros((1, 224, 224, 3))
    p = net.init(jax.random.PRNGKey(0), x)
    n_params = sum(v.size for v in jax.tree.leaves(p))
    assert n_params < 2.0e6, n_params  # real file ~1.3M fp32 params
    cost = jax.jit(net.apply).lower(p, x).compile().cost_analysis()
    assert cost["flops"] < 1.0e9, cost["flops"]  # well under 1 GFLOP/frame
    out = net.apply(p, jnp.full((2, 224, 224, 3), 0.5))
    assert out.shape == (2, 406)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_default_runner_uses_mobile_trunk():
    r = Landmark203Runner(rng=jax.random.PRNGKey(1))
    assert isinstance(r.net, MobileLandmarkNet)
    r6 = Landmark106Runner(rng=jax.random.PRNGKey(1))
    assert isinstance(r6.net, MobileLandmarkNet)
    # custom widths only exist on the residual stand-in (test-speed knob):
    # trunk selection is explicit, combining widths with the mobile default
    # is an error rather than a silent trunk switch (ADVICE r4)
    rt = Landmark203Runner(rng=jax.random.PRNGKey(1), trunk="residual",
                           widths=(8, 12, 16, 24))
    assert isinstance(rt.net, LandmarkNet)
    with pytest.raises(ValueError, match="widths"):
        Landmark203Runner(rng=jax.random.PRNGKey(1), widths=(8, 12, 16, 24))
    with pytest.raises(ValueError, match="trunk"):
        Landmark106Runner(rng=jax.random.PRNGKey(1), trunk="resnet")


@pytest.mark.parametrize("trunk", ["mobile", "residual"])
def test_runner_decode_geometry(trunk):
    """Decode matches the reference contract regardless of trunk: 203-pt
    pred in [0,1] -> *224 -> M_c2o (human_landmark_runner.py:76-84);
    106-pt pred in [-1,1] -> (p+1)*96 -> inverse affine
    (model_zoo/landmark.py:80-104)."""
    img = (np.random.RandomState(0).rand(320, 280, 3) * 255).astype(np.uint8)
    widths = (8, 12, 16, 24) if trunk == "residual" else None
    r = Landmark203Runner(rng=jax.random.PRNGKey(2), trunk=trunk,
                          widths=widths)
    pts = r.run(img)  # no prior lmk: force-resize branch
    assert pts.shape == (203, 2)
    # force-resize M_c2o is diag(scale): verify decode inverts it exactly
    crop = __import__("cv2").resize(img, (224, 224))
    blob = (crop.astype(np.float32) / 255.0)[None]
    raw = np.asarray(r._apply(r.params, jnp.asarray(blob)))[0].reshape(-1, 2)
    scale = max(img.shape[:2]) / 224.0
    np.testing.assert_allclose(pts, raw * 224.0 * scale, rtol=1e-4, atol=1e-3)

    r6 = Landmark106Runner(rng=jax.random.PRNGKey(3), trunk=trunk,
                           widths=widths)
    bbox = np.array([40.0, 60.0, 200.0, 240.0])
    pts6 = r6.get(img, bbox)
    assert pts6.shape == (106, 2)
    M = r6.crop_transform(bbox)
    from canonswap_tpu.utils import geometry as G

    crop6 = G.warp_affine(img, M, 192)
    raw6 = np.asarray(
        r6._apply(r6.params, jnp.asarray(crop6.astype(np.float32)[None]))
    )[0].reshape(-1, 2)
    expect = (raw6 + 1.0) * 96.0
    Minv = np.linalg.inv(np.vstack([M, [0, 0, 1]]))[:2]
    np.testing.assert_allclose(
        pts6, G.transform_pts(expect, Minv), rtol=1e-4, atol=1e-3)
