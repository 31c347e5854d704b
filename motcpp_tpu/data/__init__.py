"""Data layer: MOT17 sequence loading and MOT-Challenge output format.

Host-side IO (never on the TPU compute path). A native C++ fast path for
det/emb file parsing lives in native/ with this package as fallback.
"""

from motcpp_tpu.data.mot17 import MOT17Dataset, SequenceInfo
from motcpp_tpu.data.mot_format import convert_to_mot_format, write_mot_results

__all__ = [
    "MOT17Dataset",
    "SequenceInfo",
    "convert_to_mot_format",
    "write_mot_results",
]
