from .mean_vfe import MeanVFE
from .pillar_vfe import PillarVFE
from .dynamic_vfe import DynamicMeanVFE, DynamicPillarVFE
from .image_vfe import ImageVFE

__all__ = {
    "MeanVFE": MeanVFE,
    "PillarVFE": PillarVFE,
    "DynamicMeanVFE": DynamicMeanVFE,
    "DynamicPillarVFE": DynamicPillarVFE,
    # pcdet's public config names for the dynamic VFEs (vfe/__init__.py there)
    "DynMeanVFE": DynamicMeanVFE,
    "DynPillarVFE": DynamicPillarVFE,
    "ImageVFE": ImageVFE,
}
