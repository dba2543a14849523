"""Large-scale data-processing operators.

Beyond the reference's ELT surface: deduplication, similarity search,
text analysis, and multimodal-column plumbing — the operators a
training-data pipeline needs at 100 TB. All are DataFrame-level
compositions of built-in functions (JVM-side, codegen'd); Python only
appears in clearly-marked Pandas-UDF slow paths.
"""

from pyairbyte_spark.operators import (
    dedup,
    multimodal,
    search,
    similarity,
    stats,
    text,
)

__all__ = ["dedup", "multimodal", "search", "similarity", "stats", "text"]
