"""Live spectral-norm parity: nn/spectral.py vs torch.nn.utils.spectral_norm.

The converted checkpoints bake the converged sigma into SPADE conv weights
(runtime/weights.py::_conv_spectral); these tests pin the *training-time*
power iteration to torch's semantics (reference SPADE blocks,
src/modules/util.py:305-352).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonswap_tpu.nn.spectral import SNConv, spectral_normalize, spectral_sigma

torch = pytest.importorskip("torch")


def test_sigma_matches_svd():
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16))
    u = jax.random.normal(jax.random.PRNGKey(1), (16,))
    u = u / jnp.linalg.norm(u)
    sigma, _ = spectral_sigma(k, u, n_iter=100)
    true = jnp.linalg.svd(
        k.reshape(-1, 16).T, compute_uv=False
    )[0]
    np.testing.assert_allclose(float(sigma), float(true), rtol=1e-4)


def test_one_iteration_matches_torch():
    rng = np.random.RandomState(0)
    w = rng.randn(16, 8, 3, 3).astype(np.float32)  # torch OIHW
    u0 = rng.randn(16).astype(np.float32)
    u0 /= np.linalg.norm(u0)

    conv = torch.nn.Conv2d(8, 16, 3, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
    conv = torch.nn.utils.spectral_norm(conv, n_power_iterations=1)
    # overwrite torch's random u with ours, then trigger one forward
    conv.weight_u.data.copy_(torch.from_numpy(u0))
    conv.train()
    with torch.no_grad():
        conv(torch.zeros(1, 8, 5, 5))
    w_t = conv.weight.detach().numpy()  # normalized weight after 1 iter

    # ours: torch flatten is (out, in*kh*kw); ours is (kh*kw*in, out).T —
    # sigma is invariant to the column permutation but the power iteration
    # itself is too (v lives in a permuted basis; u and sigma agree).
    k_jax = jnp.asarray(w.transpose(2, 3, 1, 0))  # HWIO
    w_sn, u1 = spectral_normalize(k_jax, jnp.asarray(u0))
    np.testing.assert_allclose(
        np.asarray(w_sn).transpose(3, 2, 0, 1), w_t, rtol=2e-4, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(u1), conv.weight_u.detach().numpy(), rtol=2e-4, atol=2e-6
    )


def test_snconv_module_updates_u():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    m = SNConv(6, (3, 3))
    variables = m.init(jax.random.PRNGKey(1), x)
    # inference: no mutable collection needed, u untouched
    y = m.apply(variables, x)
    assert y.shape == (2, 8, 8, 6)
    # training: u advances
    y2, mut = m.apply(variables, x, mutable=["spectral"])
    u_before = variables["spectral"]["u"]
    u_after = mut["spectral"]["u"]
    assert not np.allclose(np.asarray(u_before), np.asarray(u_after))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(u_after)), 1.0,
                               rtol=1e-5)
