from .pointpillar_scatter import PointPillarScatter
from .height_compression import HeightCompression

__all__ = {"PointPillarScatter": PointPillarScatter, "HeightCompression": HeightCompression}
