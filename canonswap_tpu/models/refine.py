"""Post-swap 3D refine module (the reference's ``G3d``,
src/modules/adaptive_modulate.py:700-733): 3x GroupNorm-leaky 3D resblocks ->
depth-flattened 2D resblocks -> 3x 3D resblocks.
"""

from __future__ import annotations

from flax import linen as nn

from canonswap_tpu.nn.blocks import ResBlock2d, ResBlock3dLeakGN
from canonswap_tpu.nn.conv3d import (
    pack_hw2, packed_to_2d, twod_to_packed, unpack_hw2,
)


class RefineModule(nn.Module):
    int8: bool = False  # W8A8 packed 3D convs (flag_int8 lever)

    @nn.compact
    def __call__(self, volume, train: bool = False, packed_in: bool = False):
        """(B, D, H, W, C) -> (B, D, H, W, C).

        The 32-channel 3D chains run space-to-depth packed (exact numerics,
        ~4x MXU fill; see conv3d.pack_hw2).  ``packed_in=True`` accepts the
        pack_hw2 layout directly (SwapModule ``packed_out`` handoff — the
        boundary unpack+pack cancel exactly, saving two ~2-4 ms volume
        shuffles; tools/profile_r4.jsonl refine vs sub-chain sums)."""
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
