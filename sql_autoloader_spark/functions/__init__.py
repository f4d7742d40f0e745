"""LLM-data-pipeline operator families (SURVEY.md §2G).

These are the green-field extensions beyond the reference's loader
surface: text analysis, deduplication (exact → fuzzy), and embedding
similarity search, each designed for 100 TB inputs — bucketed joins,
broadcast-able small sides, no all-pairs comparisons, no driver-side
loops.
"""

from sql_autoloader_spark.functions import (
    dedup,
    events,
    multimodal,
    scale,
    similarity,
    text,
)

__all__ = ["dedup", "events", "multimodal", "scale", "similarity", "text"]
