from .cdc import CdcConfig, CdcPipeline

__all__ = ["CdcConfig", "CdcPipeline"]
