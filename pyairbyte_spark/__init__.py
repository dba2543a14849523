"""pyairbyte_spark — a PySpark-native analytics/ELT engine.

A from-scratch engine with the query and data-processing capabilities of
airbytehq/PyAirbyte (the reference), re-expressed Spark-first:

- record streams land in a Spark-managed warehouse (parquet tables),
- write strategies (append / replace / merge / auto) are DataFrame plans,
- incremental sync state is a small state table with buffer-then-finalize
  commit ordering,
- the dataset query surface is plain lazy DataFrames + a guarded SQL
  passthrough,
- plus large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) the reference does not have.

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior (cited as ``path:line``
relative to the reference checkout).
"""

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.datasets import CachedDataset, SQLDataset
from pyairbyte_spark.session import get_spark
from pyairbyte_spark.strategies import WriteStrategy

__all__ = [
    "CachedDataset",
    "SQLDataset",
    "SparkCache",
    "WriteStrategy",
    "get_spark",
]
