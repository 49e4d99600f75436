from .second_head import SECONDHead

__all__ = {"SECONDHead": SECONDHead}
