from .pointpillar_scatter import PointPillarScatter
from .height_compression import HeightCompression
from .conv2d_collapse import Conv2DCollapse

__all__ = {
    "PointPillarScatter": PointPillarScatter,
    "HeightCompression": HeightCompression,
    "Conv2DCollapse": Conv2DCollapse,
}
