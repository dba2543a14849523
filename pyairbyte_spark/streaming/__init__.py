from pyairbyte_spark.streaming.feed import ChangeFeedFollower
from pyairbyte_spark.streaming.sink import CacheStreamingSink
from pyairbyte_spark.streaming.windowed import (
    stream_from_parquet_dir,
    streaming_dedup,
    windowed_rollup,
)

__all__ = [
    "CacheStreamingSink",
    "ChangeFeedFollower",
    "stream_from_parquet_dir",
    "streaming_dedup",
    "windowed_rollup",
]
