"""JDBC read-path seam: destination-config → Spark JDBC options and
partitioned-read plans (the dialect driver jar is absent in CI, so the
network read itself is exercised only up to Spark's driver-class
resolution)."""

from __future__ import annotations

import pytest

from pyairbyte_spark import exceptions as exc
from pyairbyte_spark import jdbc


def test_postgres_url_and_options(monkeypatch):
    monkeypatch.setenv("PG_PASS", "s3cr3t")
    cfg = {
        "destinationType": "postgres",
        "host": "db.example.test",
        "port": 5433,
        "database": "warehouse",
        "username": "loader",
        "password": "secret_reference::PG_PASS",
    }
    options = jdbc.jdbc_options(cfg)
    assert options["url"] == "jdbc:postgresql://db.example.test:5433/warehouse"
    assert options["user"] == "loader"
    assert options["password"] == "s3cr3t"  # hydrated, not the reference
    assert options["driver"] == "org.postgresql.Driver"


def test_mysql_defaults_and_url_params():
    cfg = {
        "destinationType": "mysql",
        "host": "h",
        "database": "d",
        "jdbc_url_params": "ssl=true",
    }
    options = jdbc.jdbc_options(cfg)
    assert options["url"] == "jdbc:mysql://h:3306/d?ssl=true"  # default port


def test_snowflake_url():
    cfg = {
        "destinationType": "snowflake",
        "account": "acme-xy12345",
        "database": "DW",
        "warehouse": "COMPUTE_WH",
        "username": "u",
    }
    options = jdbc.jdbc_options(cfg)
    assert options["url"] == (
        "jdbc:snowflake://acme-xy12345.snowflakecomputing.com/"
        "?database=DW&warehouse=COMPUTE_WH"
    )
    assert options["driver"].startswith("net.snowflake")


def test_bigquery_url():
    options = jdbc.jdbc_options(
        {"destinationType": "bigquery", "project_id": "proj-1"}
    )
    assert "ProjectId=proj-1" in options["url"]


def test_unrecognized_and_missing_host():
    with pytest.raises(exc.PyAirbyteInputError):
        jdbc.jdbc_url({"destinationType": "faker"})
    with pytest.raises(exc.PyAirbyteInputError):
        jdbc.jdbc_url({"destinationType": "postgres", "database": "d"})


def test_partitioned_read_contract(spark):
    cfg = {"destinationType": "postgres", "host": "h", "database": "d"}
    # bounds are all-or-nothing
    with pytest.raises(exc.PyAirbyteInputError):
        jdbc.read_table(spark, cfg, "t", partition_column="id")
    with pytest.raises(exc.PyAirbyteInputError):
        jdbc.read_table(
            spark,
            cfg,
            "t",
            partition_column="id",
            lower_bound=0,
            upper_bound=10,
            num_partitions=4,
            predicates=["x > 1"],
        )


def test_read_reaches_driver_resolution(spark):
    """Without the dialect jar, the load must fail at driver-class
    resolution — proving the options (incl. the driver class) reached
    Spark's JDBC source, i.e. the plan was built correctly."""
    cfg = {"destinationType": "postgres", "host": "h", "database": "d"}
    with pytest.raises(Exception, match="org.postgresql.Driver"):
        jdbc.read_table(
            spark,
            cfg,
            "items",
            partition_column="id",
            lower_bound=0,
            upper_bound=1000,
            num_partitions=8,
        )


def test_destination_to_cache_redirects_jdbc_configs():
    from pyairbyte_spark.cloud import destination_to_cache

    with pytest.raises(exc.PyAirbyteInputError, match="jdbc.read_table"):
        destination_to_cache(
            {"destinationType": "postgres", "host": "h", "database": "d"}
        )


# -- end-to-end through a real JDBC engine (embedded Derby) -------------------
# Spark ships the Derby jars for its Hive metastore, so the full
# .load() path — partitioned range reads, per-partition predicates —
# is testable offline against a real database engine.

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_table(spark, tmp_path):
    db = str(tmp_path / "derbydb")
    url = f"jdbc:derby:{db}"
    df = spark.range(200).selectExpr(
        "id", "cast(id * 2 as double) as v", "concat('name-', id) as name"
    )
    (
        df.write.format("jdbc")
        .option("url", url + ";create=true")
        .option("dbtable", "ITEMS")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    return {"jdbc_url": url, "jdbc_driver": DERBY_DRIVER}


def test_read_table_partitioned_e2e(spark, derby_table):
    """The partitioned read loads real rows over real JDBC connections
    and materializes exactly num_partitions range slices."""
    df = jdbc.read_table(
        spark,
        derby_table,
        "ITEMS",
        partition_column="id",
        lower_bound=0,
        upper_bound=200,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
    # every partition carries a disjoint, non-empty range slice
    sizes = df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert len(sizes) == 4 and all(s > 0 for s in sizes) and sum(sizes) == 200
    # Spark's JDBC CREATE quotes identifiers, so Derby keeps them
    # case-sensitive lowercase.
    row = {r["id"]: r for r in df.collect()}[7]
    assert row["v"] == 14.0 and row["name"] == "name-7"


def test_read_table_predicates_e2e(spark, derby_table):
    """One WHERE clause per partition — the no-numeric-column shape."""
    df = jdbc.read_table(
        spark,
        derby_table,
        "ITEMS",
        predicates=['"id" < 50', '"id" >= 50 AND "id" < 120', '"id" >= 120'],
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 200


def test_read_table_single_connection_e2e(spark, derby_table):
    df = jdbc.read_table(spark, derby_table, "ITEMS")
    assert df.count() == 200
