from . import (
    aggregations,
    dedup,
    joins,
    multimodal,
    ordering,
    projections,
    sets,
    similarity,
    text,
    windows,
)

__all__ = [
    "projections",
    "aggregations",
    "windows",
    "sets",
    "ordering",
    "joins",
    "dedup",
    "similarity",
    "text",
    "multimodal",
]
