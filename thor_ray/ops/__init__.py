from . import (ann, dedup, multimodal, pack, relational, sample, sketch,
               text, window)

__all__ = ["ann", "dedup", "multimodal", "pack", "relational", "sample",
           "sketch", "text", "window"]
