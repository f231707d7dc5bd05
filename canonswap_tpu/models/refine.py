"""Post-swap 3D refine module (the reference's ``G3d``,
src/modules/adaptive_modulate.py:700-733): 3x GroupNorm-leaky 3D resblocks ->
depth-flattened 2D resblocks -> 3x 3D resblocks.
"""

from __future__ import annotations

from flax import linen as nn

from canonswap_tpu.nn.blocks import ResBlock2d, ResBlock3dLeakGN
from canonswap_tpu.nn.conv3d import (
    cslab_to_zslab, from_zslab, pack_hw2, packed_to_2d, to_zslab,
    twod_to_packed, unpack_hw2, zslab_to_cslab,
)


class RefineModule(nn.Module):
    int8: bool = False  # W8A8 packed 3D convs (flag_int8 lever)
    # 3D chain layout — must match the producing SwapModule's
    # cfg.conv3d_impl when ``packed_in`` handoffs are used
    conv3d_impl: str = "packed"
    # volume channel count C (appearance reshape_channel) — needed to split
    # the (B, H, W, D*C) z-slab handoff; unused on the packed path
    slab_channels: int = 32

    @nn.compact
    def __call__(self, volume, train: bool = False, packed_in: bool = False):
        """(B, D, H, W, C) -> (B, D, H, W, C).

        The 32-channel 3D chains run either space-to-depth packed (exact
        numerics, ~4x MXU fill; conv3d.pack_hw2) or as d-major z-slab
        block-banded dense convs (conv3d.conv3d_zdense).  ``packed_in=True``
        accepts the chain-native layout directly (SwapModule ``packed_out``
        handoff — the boundary layout round trip cancels exactly, saving two
        ~2-4 ms volume shuffles; tools/profile_r4.jsonl refine vs sub-chain
        sums)."""
        if self.conv3d_impl == "zdense":
            return self._zdense(volume, train, packed_in)
        if packed_in:
            x = volume
            c = volume.shape[-1] // 4
            d = volume.shape[1]
        else:
            c = volume.shape[-1]
            d = volume.shape[1]
            x = pack_hw2(volume)
        # int8 is inference-only: round/clip gradients are zero a.e.
        q = self.int8 and not train
        for i in range(3):
            x = ResBlock3dLeakGN(c, name=f"res3d_in_{i}", packed=True,
                                 int8=q)(x)
        x = packed_to_2d(x)
        for i in range(3):
            x = ResBlock2d(name=f"res2d_{i}", int8=self.int8)(x, train)
        x = twod_to_packed(x, d)
        for i in range(3):
            x = ResBlock3dLeakGN(c, name=f"res3d_out_{i}", packed=True,
                                 int8=q)(x)
        return unpack_hw2(x)

    def _zdense(self, volume, train, packed_in):
        """z-slab form: the 2D stage runs on the c-major slab (exactly
        packed_to_2d's layout), so the only shuffles are the two channel
        permutes at the 3D<->2D boundaries plus the final volume restore."""
        if packed_in:
            # chain-native handoff = d-major z-slab (B, H, W, D*C); the
            # C/D split is not inferable from the slab width alone, so the
            # module carries C statically (``slab_channels``, the volume's
            # reshape_channel)
            c = self.slab_channels
            d = volume.shape[-1] // c
            x = volume
        else:
            c = volume.shape[-1]
            d = volume.shape[1]
            x = to_zslab(volume)
        q = self.int8 and not train
        for i in range(3):
            x = ResBlock3dLeakGN(c, name=f"res3d_in_{i}", zslab=d,
                                 int8=q)(x)
        x = zslab_to_cslab(x, d)
        for i in range(3):
            x = ResBlock2d(name=f"res2d_{i}", int8=self.int8)(x, train)
        x = cslab_to_zslab(x, d)
        for i in range(3):
            x = ResBlock3dLeakGN(c, name=f"res3d_out_{i}", zslab=d,
                                 int8=q)(x)
        return from_zslab(x, d)
