from . import (
    asof,
    decontam,
    dedup,
    linkage,
    multimodal,
    pii,
    quality_model,
    sampling,
    similarity,
    skew,
    stats,
    text_analysis,
)

__all__ = [
    "asof",
    "decontam",
    "dedup",
    "linkage",
    "multimodal",
    "pii",
    "quality_model",
    "sampling",
    "similarity",
    "skew",
    "stats",
    "text_analysis",
]
