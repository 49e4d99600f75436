from .anchor_head_multi import AnchorHeadMulti
from .anchor_head_single import AnchorHeadSingle
from .center_head import CenterHead

__all__ = {
    "AnchorHeadSingle": AnchorHeadSingle,
    "AnchorHeadMulti": AnchorHeadMulti,
    "CenterHead": CenterHead,
}
