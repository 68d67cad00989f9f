from . import (ann, dedup, multimodal, relational, sample, sketch, text,
               window)

__all__ = ["ann", "dedup", "multimodal", "relational", "sample", "sketch",
           "text", "window"]
