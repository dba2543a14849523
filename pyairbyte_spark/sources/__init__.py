from pyairbyte_spark.sources.base import SparkSource
from pyairbyte_spark.sources.benchmark import get_benchmark_source
from pyairbyte_spark.sources.fixture import SourceTestFixture
from pyairbyte_spark.sources.faker import SourceFaker
from pyairbyte_spark.sources.smoke import SmokeTestSource

__all__ = [
    "SmokeTestSource",
    "SparkSource",
    "SourceFaker",
    "SourceTestFixture",
    "get_benchmark_source",
]
