from . import ann, dedup, multimodal, relational, text

__all__ = ["ann", "dedup", "multimodal", "relational", "text"]
