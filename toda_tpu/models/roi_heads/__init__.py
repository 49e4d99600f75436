from .parta2_head import PartA2FCHead
from .voxelrcnn_head import VoxelRCNNHead
from .pointrcnn_head import PointRCNNHead
from .pvrcnn_head import PVRCNNHead
from .second_head import SECONDHead

__all__ = {
    "SECONDHead": SECONDHead,
    "PVRCNNHead": PVRCNNHead,
    "PointRCNNHead": PointRCNNHead,
    "PartA2FCHead": PartA2FCHead,
    "VoxelRCNNHead": VoxelRCNNHead,
}
