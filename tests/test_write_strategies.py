"""Write-strategy contract tests (mirrors reference
test_source_faker_integration.py:115-208 and test_all_cache_types.py).
"""

from __future__ import annotations

import pytest

from pyairbyte_spark.sources import SourceFaker, SourceTestFixture
from pyairbyte_spark.strategies import (
    WriteMethod,
    WriteStrategy,
    resolve_write_method,
)


@pytest.fixture(params=["parquet", "commitlog"])
def cache(spark, tmp_path, request):
    """Every write-strategy contract in this module must hold against
    BOTH table stores (the rename-swap parquet store and the ACID
    commit-log store) — the TableStore seam's substitutability test."""
    from pyairbyte_spark.cache import SparkCache

    return SparkCache(
        spark, str(tmp_path / "warehouse"), table_format=request.param
    )


def test_auto_resolution_tree():
    r = resolve_write_method
    assert r(WriteStrategy.AUTO, has_primary_keys=True, has_cursor=True) == WriteMethod.MERGE
    assert r(WriteStrategy.AUTO, has_primary_keys=False, has_cursor=True) == WriteMethod.APPEND
    assert r(WriteStrategy.AUTO, has_primary_keys=False, has_cursor=False) == WriteMethod.REPLACE
    with pytest.raises(ValueError):
        r(WriteStrategy.MERGE, has_primary_keys=False, has_cursor=False)


def test_replace_is_idempotent(cache):
    for _ in range(3):
        SourceFaker(seed=1234, count=50).read(cache, write_strategy="replace")
    assert len(cache["users"]) == 50
    assert len(cache["products"]) == 100


def test_append_scales_with_syncs(cache):
    for _ in range(3):
        SourceFaker(seed=1234, count=50).read(
            cache, write_strategy="append", force_full_refresh=True
        )
    assert len(cache["users"]) == 150


def test_merge_converges_and_grows(cache):
    src_a = SourceFaker(seed=1234, count=50)
    src_a.read(cache, write_strategy="merge", force_full_refresh=True)
    assert len(cache["users"]) == 50
    # re-sync same seed → unchanged
    SourceFaker(seed=1234, count=50).read(
        cache, write_strategy="merge", force_full_refresh=True
    )
    assert len(cache["users"]) == 50
    # larger seed → grows
    SourceFaker(seed=5678, count=80).read(
        cache, write_strategy="merge", force_full_refresh=True
    )
    assert len(cache["users"]) == 80
    # smaller again → stays at max
    SourceFaker(seed=1234, count=50).read(
        cache, write_strategy="merge", force_full_refresh=True
    )
    assert len(cache["users"]) == 80


def test_merge_dedups_within_batch(spark, cache):
    """The reference has a same-batch-dupe TODO (sql_processor.py:763-765);
    our window-dedup fixes it: duplicate PKs inside ONE batch collapse."""
    from pyairbyte_spark.catalog import StreamSpec
    from pyairbyte_spark.processor import MessageStreamProcessor
    from pyairbyte_spark.sources.messages import AirbyteMessage, RecordMessage

    spec = StreamSpec(
        name="s",
        json_schema={"properties": {"id": {"type": "integer"}, "v": {"type": "string"}}},
        primary_keys=["id"],
    )
    msgs = [
        AirbyteMessage("RECORD", record=RecordMessage("s", {"id": 1, "v": "old"})),
        AirbyteMessage("RECORD", record=RecordMessage("s", {"id": 1, "v": "new"})),
        AirbyteMessage("RECORD", record=RecordMessage("s", {"id": 2, "v": "x"})),
    ]
    MessageStreamProcessor(
        cache, source_name="t", specs={"s": spec}, write_strategy=WriteStrategy.MERGE
    ).process_messages(iter(msgs))
    rows = {r["id"]: r["v"] for r in cache.get_records("s")}
    assert rows == {1: "new", 2: "x"}  # latest raw_id wins within batch


def test_fixture_streams_land_with_schemas(cache):
    res = SourceTestFixture().read(cache, write_strategy="auto")
    assert res.record_counts == {
        "always_empty_stream": 0,
        "primary_key_with_dot": 1,
        "stream1": 2,
        "stream2": 2,
    }
    # big-number precision survives DECIMAL(38,9)
    big = [r["big_number"] for r in cache.get_records("stream2")]
    assert all(int(b) == 1234567890123456 for b in big)
    # mixed-type column failed over to string
    s1 = {r["column1"]: r["sometimes_object"] for r in cache.get_records("stream1")}
    assert s1["value2"] == "string_value"


def test_schema_evolution_auto_add_column(cache):
    """Auto-add columns on re-sync with a widened schema
    (reference sql_processor.py:934-981)."""
    from pyairbyte_spark.catalog import StreamSpec
    from pyairbyte_spark.processor import MessageStreamProcessor
    from pyairbyte_spark.sources.messages import AirbyteMessage, RecordMessage

    schema_v1 = {"properties": {"id": {"type": "integer"}, "a": {"type": "string"}}}
    schema_v2 = {
        "properties": {
            "id": {"type": "integer"},
            "a": {"type": "string"},
            "b_new": {"type": "string"},
        }
    }
    spec1 = StreamSpec(name="evo", json_schema=schema_v1, primary_keys=["id"])
    MessageStreamProcessor(
        cache, source_name="t", specs={"evo": spec1}, write_strategy=WriteStrategy.APPEND
    ).process_messages(
        iter([AirbyteMessage("RECORD", record=RecordMessage("evo", {"id": 1, "a": "x"}))])
    )
    spec2 = StreamSpec(name="evo", json_schema=schema_v2, primary_keys=["id"])
    MessageStreamProcessor(
        cache, source_name="t", specs={"evo": spec2}, write_strategy=WriteStrategy.APPEND
    ).process_messages(
        iter(
            [
                AirbyteMessage(
                    "RECORD", record=RecordMessage("evo", {"id": 2, "a": "y", "b_new": "z"})
                )
            ]
        )
    )
    rows = {r["id"]: r for r in cache.get_records("evo")}
    assert rows[2]["b_new"] == "z"
    assert rows[1]["b_new"] is None  # old rows read NULL for added column


def _sync(cache, records, strategy=WriteStrategy.MERGE):
    from pyairbyte_spark.catalog import StreamSpec
    from pyairbyte_spark.processor import MessageStreamProcessor
    from pyairbyte_spark.sources.messages import AirbyteMessage, RecordMessage

    spec = StreamSpec(
        name="b",
        json_schema={"properties": {"id": {"type": "integer"}, "v": {"type": "string"}}},
        primary_keys=["id"],
    )
    msgs = [
        AirbyteMessage("RECORD", record=RecordMessage("b", {"id": i, "v": v}))
        for i, v in records
    ]
    MessageStreamProcessor(
        cache, source_name="t", specs={"b": spec}, write_strategy=strategy
    ).process_messages(iter(msgs))


@pytest.mark.parametrize("fmt", ["parquet", "commitlog"])
def test_bucketed_merge_matches_full_merge(spark, tmp_path, fmt):
    from pyairbyte_spark.cache import SparkCache

    plain = SparkCache(spark, str(tmp_path / "plain"))
    bucketed = SparkCache(
        spark, str(tmp_path / "bucketed"), merge_buckets=4, table_format=fmt
    )
    batches = [
        [(i, "v0") for i in range(40)],
        [(3, "v1"), (17, "v1"), (99, "new")],
        [(3, "v2")],
    ]
    for b in batches:
        _sync(plain, b)
        _sync(bucketed, b)
    rows = lambda c: {r["id"]: r["v"] for r in c.get_records("b")}  # noqa: E731
    assert rows(bucketed) == rows(plain)
    # dataset surface must not leak the bucket column
    assert "__pk_bucket" not in bucketed["b"].column_names


def test_bucketed_merge_rewrites_only_touched_partitions(spark, tmp_path):
    import os

    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.writers import BUCKET_COL

    cache = SparkCache(spark, str(tmp_path / "wh"), merge_buckets=8)
    _sync(cache, [(i, "v0") for i in range(64)])
    table_dir = cache.store.table_path(cache.table_name("b"))
    before = {
        d: sorted(os.listdir(os.path.join(table_dir, d)))
        for d in os.listdir(table_dir)
        if d.startswith(f"{BUCKET_COL}=")
    }
    assert len(before) == 8  # all buckets materialized
    # merge ONE key -> exactly one bucket partition gets new files
    _sync(cache, [(5, "v1")])
    after = {
        d: sorted(os.listdir(os.path.join(table_dir, d)))
        for d in os.listdir(table_dir)
        if d.startswith(f"{BUCKET_COL}=")
    }
    changed = [d for d in before if before[d] != after[d]]
    assert len(changed) == 1, changed
    assert {r["v"] for r in cache.get_records("b") if r["id"] == 5} == {"v1"}


def test_bucketed_merge_with_schema_evolution(spark, tmp_path):
    """A new column arriving mid-stream works on bucketed tables:
    untouched buckets lack the column, mergeSchema fills nulls."""
    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.catalog import StreamSpec
    from pyairbyte_spark.processor import MessageStreamProcessor
    from pyairbyte_spark.sources.messages import AirbyteMessage, RecordMessage

    cache = SparkCache(spark, str(tmp_path / "wh"), merge_buckets=4)
    _sync(cache, [(i, "v0") for i in range(20)])
    spec2 = StreamSpec(
        name="b",
        json_schema={
            "properties": {
                "id": {"type": "integer"},
                "v": {"type": "string"},
                "extra": {"type": "string"},
            }
        },
        primary_keys=["id"],
    )
    msgs = [
        AirbyteMessage(
            "RECORD", record=RecordMessage("b", {"id": 1, "v": "v1", "extra": "x"})
        )
    ]
    MessageStreamProcessor(
        cache, source_name="t", specs={"b": spec2}, write_strategy=WriteStrategy.MERGE
    ).process_messages(iter(msgs))
    rows = {r["id"]: (r["v"], r.get("extra")) for r in cache.get_records("b")}
    assert rows[1] == ("v1", "x")
    assert rows[2] == ("v0", None)  # untouched bucket row: null-filled
    assert len(rows) == 20


@pytest.mark.parametrize("fmt", ["parquet", "commitlog"])
def test_bucket_count_survives_store_reopen(spark, tmp_path, fmt):
    """The bucket count is TABLE layout, persisted in a sidecar: a
    store reopened with a different merge_buckets must keep merging
    correctly (hashing with a new N would probe the wrong buckets and
    leave stale PK rows behind)."""
    from pyairbyte_spark.cache import SparkCache

    wh = str(tmp_path / "wh")
    cache4 = SparkCache(spark, wh, merge_buckets=4, table_format=fmt)
    _sync(cache4, [(i, "v0") for i in range(40)])

    # Reopen with a DIFFERENT bucket config and merge updates.
    cache16 = SparkCache(spark, wh, merge_buckets=16, table_format=fmt)
    _sync(cache16, [(3, "v1"), (17, "v1")])

    rows = {}
    dupes = []
    for r in cache16.get_records("b"):
        if r["id"] in rows:
            dupes.append(r["id"])
        rows[r["id"]] = r["v"]
    assert not dupes, f"stale PK rows left in old buckets: {dupes}"
    assert len(rows) == 40 and rows[3] == "v1" and rows[17] == "v1"


def test_late_records_after_complete_trace(spark, tmp_path):
    """Records arriving after a stream's COMPLETE trace must still
    load (re-finalize), and the second finalize must not re-read the
    already-loaded batch files (no duplicates under APPEND)."""
    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.catalog import StreamSpec
    from pyairbyte_spark.processor import MessageStreamProcessor
    from pyairbyte_spark.sources.messages import (
        AirbyteMessage,
        RecordMessage,
        TraceMessage,
    )

    cache = SparkCache(spark, str(tmp_path / "wh"))
    spec = StreamSpec(
        name="s",
        json_schema={"properties": {"id": {"type": "integer"}}},
    )
    complete = AirbyteMessage(
        "TRACE",
        trace=TraceMessage(
            trace_type="STREAM_STATUS", stream_name="s", status="COMPLETE"
        ),
    )
    msgs = (
        [AirbyteMessage("RECORD", record=RecordMessage("s", {"id": i})) for i in range(3)]
        + [complete]
        + [AirbyteMessage("RECORD", record=RecordMessage("s", {"id": i})) for i in (10, 11)]
        + [complete]
    )
    results = MessageStreamProcessor(
        cache, source_name="t", specs={"s": spec}, write_strategy=WriteStrategy.APPEND
    ).process_messages(iter(msgs))
    ids = sorted(r["id"] for r in cache.get_records("s"))
    assert ids == [0, 1, 2, 10, 11], ids  # late rows kept, no dupes
    assert results["s"].record_count == 5


def test_salted_merge_matches_unsalted_on_hot_key(spark, tmp_path):
    """Hot-PK salting pre-reduces the dedup window on (pk, salt); the
    survivor set must be identical to the unsalted merge — the ORDER
    columns decide the winner, the salt only routes rows."""
    from pyairbyte_spark.cache import SparkCache

    # Pathological distribution: one key carries 500 versions.
    hot = [(1, f"v{i}") for i in range(500)] + [(k, "x") for k in range(2, 20)]
    plain = SparkCache(spark, str(tmp_path / "plain"))
    salted = SparkCache(spark, str(tmp_path / "salted"), merge_salt=8)
    _sync(plain, hot)
    _sync(salted, hot)
    rows = lambda c: sorted(  # noqa: E731
        (r["id"], r["v"]) for r in c.get_records("b")
    )
    assert rows(salted) == rows(plain)
    # Latest version of the hot key survived (arrival order = seq).
    assert dict(rows(salted))[1] == "v499"


def test_late_records_after_complete_do_not_replace_committed_rows(spark, tmp_path):
    """AUTO with no PK/cursor resolves to REPLACE: the re-finalize for
    late records must APPEND them, not REPLACE the table with only the
    late batch (which would silently delete the committed rows)."""
    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.catalog import StreamSpec
    from pyairbyte_spark.processor import MessageStreamProcessor
    from pyairbyte_spark.sources.messages import (
        AirbyteMessage,
        RecordMessage,
        TraceMessage,
    )

    cache = SparkCache(spark, str(tmp_path / "wh"))
    spec = StreamSpec(
        name="s", json_schema={"properties": {"id": {"type": "integer"}}}
    )  # no primary keys, no cursor -> REPLACE under AUTO
    complete = AirbyteMessage(
        "TRACE",
        trace=TraceMessage(
            trace_type="STREAM_STATUS", stream_name="s", status="COMPLETE"
        ),
    )
    msgs = (
        [AirbyteMessage("RECORD", record=RecordMessage("s", {"id": i})) for i in range(3)]
        + [complete]
        + [AirbyteMessage("RECORD", record=RecordMessage("s", {"id": i})) for i in (10, 11)]
    )
    results = MessageStreamProcessor(
        cache, source_name="t", specs={"s": spec}, write_strategy=WriteStrategy.AUTO
    ).process_messages(iter(msgs))
    ids = sorted(r["id"] for r in cache.get_records("s"))
    assert ids == [0, 1, 2, 10, 11], ids
    assert results["s"].record_count == 5


def test_append_to_premetadata_bucketed_table_keeps_full_rewrite_merge(spark, tmp_path):
    """A bucketed table with no sidecar has an UNKNOWN hash N; an
    append must not stamp the store's current N (that would unlock the
    incremental merge path against wrongly-hashed old files). Without a
    sidecar, merge takes the full rewrite — which re-buckets and only
    then stamps."""
    import os

    from pyairbyte_spark.cache import SparkCache

    wh = str(tmp_path / "wh")
    cache8 = SparkCache(spark, wh, merge_buckets=8)
    _sync(cache8, [(i, "v0") for i in range(40)])
    meta = cache8.store._meta_path(cache8.table_name("b"))
    os.remove(meta)  # simulate a pre-metadata layout

    cache16 = SparkCache(spark, wh, merge_buckets=16)
    _sync(cache16, [(50, "v1")], strategy=WriteStrategy.APPEND)
    assert cache16.store._persisted_buckets(cache16.table_name("b")) is None

    _sync(cache16, [(3, "v2"), (17, "v2")])  # merge -> full rewrite
    rows: dict[int, str] = {}
    dupes = []
    for r in cache16.get_records("b"):
        if r["id"] in rows:
            dupes.append(r["id"])
        rows[r["id"]] = r["v"]
    assert not dupes, f"stale PK rows: {dupes}"
    assert len(rows) == 41 and rows[3] == "v2" and rows[17] == "v2"
    # the full rewrite re-bucketed with the store's N and stamped it
    assert cache16.store._persisted_buckets(cache16.table_name("b")) == 16


def test_cross_family_type_conflict_fails_fast(spark, tmp_path):
    """int->string on append previously succeeded and broke every
    LATER read (deferred failure). Numeric widening stays allowed
    (parquet mergeSchema handles it); cross-family conflicts raise at
    write time with guidance."""
    from pyspark.sql import functions as F

    from pyairbyte_spark.writers import CommitLogTableStore, TableStore

    def mk(schema, row, p):
        return (
            spark.createDataFrame([row], schema)
            .withColumn("_airbyte_raw_id", F.lit(p))
            .withColumn("_airbyte_extracted_at", F.current_timestamp())
        )

    # Plain parquet store: ONE directory, mergeSchema cannot widen even
    # int32→int64 — ANY type change fails fast.
    pstore = TableStore(spark, str(tmp_path / "p"), "m")
    pstore.write_append(mk("id long, x int", (1, 10), "a"), "t")
    with pytest.raises(ValueError, match="parquet cannot merge"):
        pstore.write_append(mk("id long, x long", (2, 2**40), "b"), "t")
    assert pstore.read("t").count() == 1

    # Commit-log store: per-entry reads union BY NAME → numeric
    # widening allowed; cross-family still fails fast.
    store = CommitLogTableStore(spark, str(tmp_path / "c"), "m")
    store.write_append(mk("id long, x int", (1, 10), "a"), "t")
    store.write_append(mk("id long, x long", (2, 2**40), "b"), "t")
    assert sorted(r["x"] for r in store.read("t").collect()) == [10, 2**40]
    with pytest.raises(ValueError, match="parquet cannot merge"):
        store.write_append(mk("id long, x string", (3, "s"), "c"), "t")
    # table still fully readable
    assert store.read("t").count() == 2

    # bucketed incremental merge guards too
    store = CommitLogTableStore(
        spark, str(tmp_path / "bm"), "m", merge_buckets=4
    )
    store.write_merge(mk("id long, x int", (1, 10), "a"), "t", ["id"])
    with pytest.raises(ValueError, match="parquet cannot merge"):
        store.write_merge(mk("id long, x string", (1, "s"), "b"), "t", ["id"])
