"""Checkpoint-conversion CLI round trip with synthetic torch checkpoints
built from the reference's own torch modules."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

pytest.importorskip("src.modules.util")


def test_convert_combined_checkpoint(tmp_path):
    import src.modules.appearance_feature_extractor as ref_app
    import src.modules.stitching_retargeting_network as ref_st

    from canonswap_tpu.cli import convert as CV
    from canonswap_tpu.runtime import checkpoint as CK

    torch.manual_seed(0)
    app = ref_app.AppearanceFeatureExtractor(
        image_channel=3, block_expansion=8, num_down_blocks=2,
        max_features=32, reshape_channel=4, reshape_depth=8, num_resblocks=2,
    )
    # a combined checkpoint containing just one of the six nets still
    # converts (the converter handles present keys only)
    src_pth = tmp_path / "combined.pth"
    torch.save({"appearance_feature_extractor": app.state_dict()}, src_pth)
    dst = tmp_path / "combined.npz"
    CV.main(["combined", str(src_pth), str(dst)])
    tree = CK.load_npz(str(dst))
    k = tree["appearance_feature_extractor"]["params"]["first"]["Conv_0"]["kernel"]
    assert k.shape == (3, 3, 3, 8)

    # stitching checkpoint
    def mk(inp, hid, out):
        return ref_st.StitchingRetargetingNetwork(
            input_size=inp, hidden_sizes=list(hid), output_size=out
        ).state_dict()

    st_pth = tmp_path / "stitch.pth"
    torch.save(
        {
            "retarget_shoulder": mk(126, (128, 128, 64), 65),
            "retarget_mouth": mk(65, (128, 128, 64), 63),
            "retarget_eye": mk(66, (256, 256, 128, 128, 64), 63),
        },
        st_pth,
    )
    dst2 = tmp_path / "stitch.npz"
    CV.main(["stitching", str(st_pth), str(dst2)])
    tree2 = CK.load_npz(str(dst2))
    assert tree2["params"]["eye"]["fc0"]["kernel"].shape == (66, 256)
    assert tree2["params"]["stitching"]["out"]["kernel"].shape == (64, 65)
