from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", str(min(8, os.cpu_count() or 4)))


@pytest.fixture(scope="session")
def spark():
    from pyairbyte_spark import get_spark

    spark = get_spark(
        "pyairbyte-spark-tests",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield spark
    spark.stop()


@pytest.fixture()
def cache(spark, tmp_path):
    from pyairbyte_spark import SparkCache

    return SparkCache(spark, str(tmp_path / "warehouse"))


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMALL = "/root/testdata/sf0.001"
