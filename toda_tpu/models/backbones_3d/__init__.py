__all__ = {}


def _register():
    from .spconv_backbone import VoxelBackBone8x, VoxelResBackBone8x
    from .pillar_sparse_backbone import PillarBackBone8x, PillarResBackBone8x
    from .pointnet2_backbone import PointNet2MSG
    from .pillar_unet import UNetV2

    __all__["VoxelBackBone8x"] = VoxelBackBone8x
    __all__["VoxelResBackBone8x"] = VoxelResBackBone8x
    __all__["PillarBackBone8x"] = PillarBackBone8x
    __all__["PillarResBackBone8x"] = PillarResBackBone8x
    __all__["PointNet2MSG"] = PointNet2MSG
    __all__["UNetV2"] = UNetV2


_register()

# backbones that consume raw points and own their voxelization
POINT_CONSUMING = {"PillarBackBone8x", "PillarResBackBone8x", "PointNet2MSG", "UNetV2"}
