from . import (ann, dedup, graph, multimodal, pack, relational, sample,
               sketch, text, window)

__all__ = ["ann", "dedup", "graph", "multimodal", "pack", "relational",
           "sample", "sketch", "text", "window"]
