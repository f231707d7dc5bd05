"""On-the-fly spectral normalization (training-time).

The converted inference checkpoints carry spectral norm *baked into* the SPADE
conv weights (runtime/weights.py::_conv_spectral divides by the converged
sigma, mirroring torch's ``spectral_norm`` buffers — reference
src/modules/util.py:347-352, spade blocks at util.py:305-344).  For training
SPADE from scratch we need the live version: one power iteration per step on
a persistent ``u`` vector, exactly torch's ``nn.utils.spectral_norm``
semantics (weight / sigma, u updated in-place, eps=1e-12).

``SNConv`` stores ``u`` in the ``"spectral"`` variable collection; pass
``mutable=["spectral", ...]`` in apply() during training to persist the
power-iteration state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _l2norm(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / (jnp.linalg.norm(v) + eps)


def spectral_sigma(kernel: jax.Array, u: jax.Array, n_iter: int = 1):
    """One (or more) power iterations on the (out, -1) flattened kernel.

    kernel: (..., out) in HWIO/DHWIO layout; u: (out,).
    Returns (sigma, u_new).  Column order differs from torch's
    (out, in*kh*kw) flatten but singular values are permutation-invariant.
    """
    w = kernel.reshape(-1, kernel.shape[-1]).T.astype(jnp.float32)  # (out, K)
    u = u.astype(jnp.float32)
    for _ in range(n_iter):
        v = _l2norm(w.T @ u)
        u = _l2norm(w @ v)
    sigma = u @ (w @ v)
    return sigma, u


def spectral_normalize(kernel: jax.Array, u: jax.Array, n_iter: int = 1):
    """Returns (kernel / sigma, u_new) — torch ``spectral_norm`` forward."""
    sigma, u_new = spectral_sigma(kernel, u, n_iter)
    # no gradient through the power-iteration state (torch: u,v are buffers
    # updated under no_grad; sigma itself IS differentiated through w)
    u_new = jax.lax.stop_gradient(u_new)
    return kernel / sigma.astype(kernel.dtype), u_new


class SNConv(nn.Module):
    """2D conv with live spectral normalization (training-time SPADE convs).

    Equivalent to ``spectral_norm(nn.Conv2d(...))`` in the reference's SPADE
    blocks.  With ``update_u=False`` (eval) the stored ``u`` is used without
    being advanced.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_u: bool = True):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features),
        )
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2norm(
                jax.random.normal(jax.random.PRNGKey(0), (self.features,))
            ),
        )
        w_sn, u_new = spectral_normalize(kernel, u_var.value)
        if (
            update_u
            and not self.is_initializing()
            and self.is_mutable_collection("spectral")
        ):
            u_var.value = u_new
        y = jax.lax.conv_general_dilated(
            x, w_sn.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y
