"""Appearance (ReID) layer — on-device crops + Flax CNN inference.

TPU-native replacement for the reference's ONNX-Runtime backend
(reference: src/appearance/{reid_backend,onnx_backend}.{hpp,cpp}): crop
extraction/resize/normalization run as batched jnp gathers and the ReID
CNN (OSNet) is a Flax module jitted on the TPU, so detection crops never
leave the device between the tracker and the embedding.
"""

from motcpp_tpu.appearance.reid import (
    ReIDBackend,
    embed_valid_crops,
    make_embed_fn,
)
from motcpp_tpu.appearance.osnet import (
    OSNet,
    osnet_x0_25,
    osnet_x0_5,
    osnet_x0_75,
    osnet_x1_0,
)

__all__ = ["ReIDBackend", "make_embed_fn", "embed_valid_crops", "OSNet",
           "osnet_x1_0", "osnet_x0_75", "osnet_x0_5", "osnet_x0_25"]
