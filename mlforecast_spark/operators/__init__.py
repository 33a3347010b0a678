from . import dedup, lm, multimodal, packing, sampling, similarity, text

__all__ = [
    "dedup",
    "lm",
    "multimodal",
    "packing",
    "sampling",
    "similarity",
    "text",
]
