from .cdc import CdcConfig, CdcPipeline

__all__ = ["CdcConfig", "CdcPipeline"]


def __getattr__(name):
    # lazy: ivm/joinview pull in ray.data at import time
    if name in ("IncrementalView", "RetractionView"):
        from . import ivm
        return getattr(ivm, name)
    if name == "JoinView":
        from .joinview import JoinView
        return JoinView
    if name in ("WindowedAggregator", "SessionAggregator",
                "IntervalJoinStream"):
        from . import stream_window
        return getattr(stream_window, name)
    raise AttributeError(name)
