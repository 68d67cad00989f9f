from . import (ann, dedup, graph, linalg, multimodal, pack, relational,
               sample, sketch, text, window)

__all__ = ["ann", "dedup", "graph", "linalg", "multimodal", "pack",
           "relational", "sample", "sketch", "text", "window"]
