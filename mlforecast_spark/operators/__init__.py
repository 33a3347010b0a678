from . import dedup, multimodal, packing, sampling, similarity, text

__all__ = ["dedup", "multimodal", "packing", "sampling", "similarity", "text"]
