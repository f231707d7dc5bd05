"""Post-swap 3D refine module (the reference's ``G3d``,
src/modules/adaptive_modulate.py:700-733): 3x GroupNorm-leaky 3D resblocks ->
depth-flattened 2D resblocks -> 3x 3D resblocks.
"""

from __future__ import annotations

from flax import linen as nn

from canonswap_tpu.nn.blocks import ResBlock2d, ResBlock3dLeakGN
from canonswap_tpu.nn.conv3d import pack_hw2, unpack_hw2
from canonswap_tpu.ops.resize import volume_from_2d, volume_to_2d


class RefineModule(nn.Module):
    int8: bool = False  # W8A8 packed 3D convs (flag_int8 lever)
    # run each packed GN-leak chain as ONE VMEM-resident fused W8A8 Pallas
    # kernel (ops/pallas/chain3d.py); same param tree
    fused_chain: bool = False

    def _gn_chain(self, x, c, names):
        import jax

        from canonswap_tpu.nn.blocks import _Res3dGNParams
        from canonswap_tpu.ops.pallas.chain3d import (
            res3d_gn_chain, res3d_gn_chain_params)

        blocks = [_Res3dGNParams(c, name=n)() for n in names]
        interp = jax.default_backend() not in ("tpu", "axon")
        return res3d_gn_chain(
            x, res3d_gn_chain_params(blocks, groups=min(32, c)),
            groups=min(32, c), interpret=interp)

    @nn.compact
    def __call__(self, volume, train: bool = False):
        """(B, D, H, W, C) -> (B, D, H, W, C).

        The 32-channel 3D chains run space-to-depth packed (exact numerics,
        ~4x MXU fill; see conv3d.pack_hw2)."""
        c = volume.shape[-1]
        d = volume.shape[1]
        fused = self.fused_chain and not train
        # int8 is inference-only: round/clip gradients are zero a.e.
        q = self.int8 and not train
        x = pack_hw2(volume)
        if fused:
            x = self._gn_chain(x, c, [f"res3d_in_{i}" for i in range(3)])
        else:
            for i in range(3):
                x = ResBlock3dLeakGN(c, name=f"res3d_in_{i}", packed=True,
                                     int8=q)(x)
        x = volume_to_2d(unpack_hw2(x))
        for i in range(3):
            x = ResBlock2d(name=f"res2d_{i}", int8=self.int8)(x, train)
        x = pack_hw2(volume_from_2d(x, d))
        if fused:
            x = self._gn_chain(x, c, [f"res3d_out_{i}" for i in range(3)])
        else:
            for i in range(3):
                x = ResBlock3dLeakGN(c, name=f"res3d_out_{i}", packed=True,
                                     int8=q)(x)
        return unpack_hw2(x)
