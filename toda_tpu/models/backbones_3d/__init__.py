__all__ = {}


def _register():
    from .spconv_backbone import VoxelBackBone8x, VoxelResBackBone8x

    __all__["VoxelBackBone8x"] = VoxelBackBone8x
    __all__["VoxelResBackBone8x"] = VoxelResBackBone8x


try:
    _register()
except ImportError:
    pass
