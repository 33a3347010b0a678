from . import bpe, dedup, lm, multimodal, packing, sampling, similarity, text

__all__ = [
    "bpe",
    "dedup",
    "lm",
    "multimodal",
    "packing",
    "sampling",
    "similarity",
    "text",
]
