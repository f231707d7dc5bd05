"""XPose / UniPose open-vocabulary keypoint detector (animal landmarks).

TPU-native rebuild of the reference's vendored ED-Pose model
(src/utils/dependencies/XPose/models/UniPose/*): Swin-T backbone,
4-level deformable transformer with vision<->text fusion, two-stage query
selection, and the keypoint-group decoder.  The reference only reaches this
model on the (dead) ``image_type == 'animal_face'`` path
(src/utils/cropper.py:80-88); it is rebuilt here to close the last
component-inventory row.
"""

from canonswap_tpu.models.xpose.unipose import UniPose, UniPoseConfig
from canonswap_tpu.models.xpose.runner import XPoseRunner

__all__ = ["UniPose", "UniPoseConfig", "XPoseRunner"]
