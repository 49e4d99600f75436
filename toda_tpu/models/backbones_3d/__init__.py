__all__ = {}


def _register():
    from .spconv_backbone import VoxelBackBone8x, VoxelResBackBone8x
    from .pillar_sparse_backbone import PillarBackBone8x, PillarResBackBone8x

    __all__["VoxelBackBone8x"] = VoxelBackBone8x
    __all__["VoxelResBackBone8x"] = VoxelResBackBone8x
    __all__["PillarBackBone8x"] = PillarBackBone8x
    __all__["PillarResBackBone8x"] = PillarResBackBone8x


_register()

# backbones that consume raw points and own their voxelization
POINT_CONSUMING = {"PillarBackBone8x", "PillarResBackBone8x"}
