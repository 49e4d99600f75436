from .detector3d import Detector3D, DetectorBundle, DatasetMeta, build_detector

__all__ = ["Detector3D", "DetectorBundle", "DatasetMeta", "build_detector"]
