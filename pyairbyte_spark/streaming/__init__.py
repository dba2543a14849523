from pyairbyte_spark.streaming.feed import ChangeFeedFollower
from pyairbyte_spark.streaming.index_sync import IndexSyncFollower
from pyairbyte_spark.streaming.sink import CacheStreamingSink
from pyairbyte_spark.streaming.windowed import (
    stream_from_parquet_dir,
    streaming_dedup,
    windowed_rollup,
)

__all__ = [
    "CacheStreamingSink",
    "ChangeFeedFollower",
    "IndexSyncFollower",
    "stream_from_parquet_dir",
    "streaming_dedup",
    "windowed_rollup",
]
