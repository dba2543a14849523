"""Property-based tests (hypothesis) — stronger than the reference's
example-based unit tests (SURVEY §5 notes it has no property corpus)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyairbyte_spark.names import LowerCaseNormalizer, NameNormalizationError
from pyairbyte_spark.sql_guard import is_safe_sql
from pyairbyte_spark.types import to_spark_type

IDENT = re.compile(r"^[a-z0-9_]+$")


@given(st.text(min_size=1, max_size=64))
@settings(max_examples=300, deadline=None)
def test_normalizer_output_is_valid_identifier_or_raises(name):
    try:
        out = LowerCaseNormalizer.normalize(name)
    except NameNormalizationError:
        return
    assert IDENT.match(out)
    assert not out[0].isdigit()
    # idempotent
    assert LowerCaseNormalizer.normalize(out) == out


@given(
    st.recursive(
        st.one_of(
            st.none(),
            st.sampled_from(
                ["string", "integer", "number", "boolean", "object", "array", "weird"]
            ),
            st.lists(
                st.sampled_from(["null", "string", "integer", "number"]),
                max_size=3,
            ),
        ),
        lambda children: children,
        max_leaves=3,
    ),
    st.sampled_from([None, "date", "date-time", "time", "bogus"]),
)
@settings(max_examples=300, deadline=None)
def test_type_compiler_total_function(type_node, fmt):
    """The compiler never raises — anything unresolvable fails over to
    string (reference types.py:115-117)."""
    schema = {}
    if type_node is not None:
        schema["type"] = type_node
    if fmt is not None:
        schema["format"] = fmt
    dtype = to_spark_type(schema)
    assert dtype is not None


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_sql_guard_never_allows_write_verbs(sql):
    if is_safe_sql(sql):
        lowered = sql.lower()
        for verb in ("insert ", "update ", "delete ", "drop ", "truncate "):
            assert not lowered.strip().startswith(verb)
        # No statement separator outside string literals/comments.
        from pyairbyte_spark.sql_guard import strip_comments

        assert ";" not in strip_comments(sql).rstrip("; \n\t")


# -- merge semantics properties (Spark-backed: few, small examples) ---------

_recs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), st.text("ab", max_size=3)),
    min_size=1,
    max_size=8,
)


@given(records=_recs)
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_merge_is_idempotent_and_last_wins(spark, records):
    """Merging a batch twice converges to the same table, and the
    surviving value per PK is the LAST occurrence in arrival order
    (the seq-in-raw-id contract)."""
    import tempfile

    from pyairbyte_spark import SparkCache
    from pyairbyte_spark.catalog import StreamSpec
    from pyairbyte_spark.processor import MessageStreamProcessor
    from pyairbyte_spark.sources.messages import AirbyteMessage, RecordMessage
    from pyairbyte_spark.strategies import WriteStrategy

    spec = StreamSpec(
        name="m",
        json_schema={"properties": {"id": {"type": "integer"}, "v": {"type": "string"}}},
        primary_keys=["id"],
    )
    expected = {}
    msgs = []
    for pk, v in records:
        expected[pk] = v  # last occurrence wins
        msgs.append(AirbyteMessage("RECORD", record=RecordMessage("m", {"id": pk, "v": v})))

    cache = SparkCache(spark, tempfile.mkdtemp())
    for _ in range(2):  # idempotent re-sync
        MessageStreamProcessor(
            cache, source_name="t", specs={"m": spec},
            write_strategy=WriteStrategy.MERGE,
        ).process_messages(iter(list(msgs)))
        got = {r["id"]: r["v"] for r in cache.get_records("m")}
        assert got == expected


@given(
    n_words=st.integers(min_value=1, max_value=60),
    chunk=st.integers(min_value=1, max_value=12),
    overlap=st.integers(min_value=0, max_value=11),
)
@settings(max_examples=12, deadline=None)
def test_chunking_covers_every_token_without_loss(spark, n_words, chunk, overlap):
    """Every token of the document appears in at least one chunk; no
    chunk exceeds chunk_tokens; reassembling disjoint chunks
    (stride == chunk) reproduces the document exactly. (stride >
    chunk_tokens is rejected outright — it would skip tokens.)"""
    import pytest as _pytest

    from pyairbyte_spark.operators.curation import chunk_documents

    stride = max(1, chunk - overlap)
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    out = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(
            df, "text", "doc_id", chunk_tokens=chunk, stride=stride
        ).collect()
    )
    covered = set()
    for _, text, n_tok in out:
        toks = text.split(" ")
        assert len(toks) == n_tok <= chunk
        covered.update(toks)
    assert covered == set(words)
    if stride == chunk:  # disjoint chunks reassemble the document
        assert " ".join(t for _, t, _ in out) == " ".join(words)
    with _pytest.raises(ValueError, match="skip tokens"):
        chunk_documents(df, "text", "doc_id", chunk_tokens=chunk, stride=chunk + 1)


@given(
    weights=st.lists(
        st.floats(min_value=0.01, max_value=1000, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    n=st.integers(min_value=1, max_value=10),
)
@settings(max_examples=10, deadline=None)
@pytest.mark.slow
def test_weighted_sample_size_and_membership(spark, weights, n):
    """Sample size is exactly min(n, rows); every sampled id exists;
    the selection is a function of (seed, ids) only."""
    from pyairbyte_spark.operators.curation import weighted_sample_per_stratum

    rows = [(i, "s", w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["id", "g", "w"])
    out = weighted_sample_per_stratum(
        df, ["g"], n=n, weight_col="w", id_col="id", seed="p"
    ).collect()
    ids = sorted(r["id"] for r in out)
    assert len(ids) == min(n, len(weights))
    assert set(ids) <= set(range(len(weights)))
    again = weighted_sample_per_stratum(
        df.repartition(7), ["g"], n=n, weight_col="w", id_col="id", seed="p"
    ).collect()
    assert sorted(r["id"] for r in again) == ids  # partitioning-independent


# -- int8 quantization properties (Spark-backed: few, small examples) -------

_vecs = st.lists(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=4,
)


@given(vecs=_vecs)
@settings(max_examples=8, deadline=None)
def test_quantize_int8_reconstruction_bound(spark, vecs):
    """For ANY finite vectors: q stays in [-127, 127], the max-abs
    element maps to ±127, and dequantized error per element is at most
    half a quantization step."""
    from pyairbyte_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    for row in quantize_int8(df).collect():
        orig = [float(x) for x in vecs[row["vec_id"]]]
        scale, q = row["scale"], row["q"]
        assert scale == max(abs(x) for x in orig)
        step = scale / 127.0 if scale else 0.0
        assert all(abs(qv) <= 127 for qv in q)
        if scale:
            assert 127 in q or -127 in q
        for x, qv in zip(orig, q):
            assert abs(x - qv * step) <= step / 2 + 1e-9 * max(scale, 1.0)


@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["replace", "merge"]),
            st.lists(
                st.tuples(st.integers(0, 6), st.integers(0, 9)),
                min_size=1,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=6, deadline=None)
@pytest.mark.slow
def test_commitlog_store_matches_model(spark, tmp_path_factory, ops):
    """Model-based check: any sequence of replace/merge against the
    ACID store must match an exact in-memory model of the contract —
    REPLACE keeps whatever the source sent (duplicates included);
    bucketed MERGE latest-wins-dedups exactly the TOUCHED buckets and
    leaves other buckets' rows (even duplicated ones) untouched. The
    latest snapshot must also survive a vacuum. (APPEND has dedicated
    tests; it trivially concatenates.)"""
    from pyspark.sql import functions as F

    from pyairbyte_spark.writers import CommitLogTableStore

    tmp = tmp_path_factory.mktemp("clog-prop")
    store = CommitLogTableStore(spark, str(tmp), "m", merge_buckets=3)
    # the model uses the store's OWN bucket mapping (computed once)
    keys = list(range(7))
    bucket_of = dict(
        spark.createDataFrame([(k,) for k in keys], ["id"])
        .select("id", store._bucket_expr(["id"], 3).alias("b"))
        .collect()
    )
    model = []  # rows: (key, value, seq, pos) — seq/pos order the wins
    seq = 0
    for kind, rows in ops:
        seq += 1
        df = spark.createDataFrame(
            [(k, v, f"s{seq}-{pos:04d}") for pos, (k, v) in enumerate(rows)],
            ["id", "v", "_airbyte_raw_id"],
        ).withColumn("_airbyte_extracted_at", F.lit(seq).cast("timestamp"))
        batch = [(k, v, seq, pos) for pos, (k, v) in enumerate(rows)]
        if kind == "replace":
            store.write_replace(df, "t", ["id"])
            model = batch
        else:
            store.write_merge(df, "t", ["id"])
            touched = {bucket_of[k] for k, *_ in batch}
            keep = [r for r in model if bucket_of[r[0]] not in touched]
            candidates = [r for r in model if bucket_of[r[0]] in touched] + batch
            latest = {}
            for r in sorted(candidates, key=lambda r: (r[2], r[3])):
                latest[r[0]] = r  # later (seq, pos) overwrites
            model = keep + list(latest.values())
        got = sorted(
            (r["id"], r["v"]) for r in store.read("t").select("id", "v").collect()
        )
        assert got == sorted((k, v) for k, v, *_ in model), f"after {kind} {rows}"
    store.vacuum("t")
    got = sorted(
        (r["id"], r["v"]) for r in store.read("t").select("id", "v").collect()
    )
    assert got == sorted((k, v) for k, v, *_ in model)


@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(
                ["merge", "delete", "mor_delete", "update", "compact",
                 "optimize", "rename"]
            ),
            st.lists(
                st.tuples(st.integers(0, 6), st.integers(0, 9)),
                min_size=1,
                max_size=4,
            ),
            st.integers(0, 6),
        ),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=10, deadline=None)
def test_commitlog_dml_matches_model(spark, tmp_path_factory, ops):
    """Model-based check over the full DML surface: any interleaving of
    bucketed MERGE, file-pruned DELETE (id >= p), file-pruned UPDATE
    (id <= p: v += 100), and clustered COMPACT must match the exact
    in-memory model — deletes can never resurrect, updates keep their
    original win-ordering (bookkeeping untouched), compaction is
    invisible."""
    from pyspark.sql import functions as F

    from pyairbyte_spark.writers import CommitLogTableStore

    tmp = tmp_path_factory.mktemp("clog-dml-prop")
    store = CommitLogTableStore(spark, str(tmp), "m", merge_buckets=3)
    keys = list(range(7))
    bucket_of = dict(
        spark.createDataFrame([(k,) for k in keys], ["id"])
        .select("id", store._bucket_expr(["id"], 3).alias("b"))
        .collect()
    )
    model: list[tuple] = []  # (key, value, seq, pos)
    seq = 0
    vname = "v"  # current LOGICAL name of the value column
    for kind, rows, param in ops:
        seq += 1
        if kind == "merge":
            df = spark.createDataFrame(
                [(k, v, f"s{seq}-{pos:04d}") for pos, (k, v) in enumerate(rows)],
                ["id", vname, "_airbyte_raw_id"],
            ).withColumn("_airbyte_extracted_at", F.lit(seq).cast("timestamp"))
            store.write_merge(df, "t", ["id"])
            batch = [(k, v, seq, pos) for pos, (k, v) in enumerate(rows)]
            touched = {bucket_of[k] for k, *_ in batch}
            keep = [r for r in model if bucket_of[r[0]] not in touched]
            cands = [r for r in model if bucket_of[r[0]] in touched] + batch
            latest = {}
            for r in sorted(cands, key=lambda r: (r[2], r[3])):
                latest[r[0]] = r
            model = keep + list(latest.values())
        elif not store.table_exists("t"):
            continue  # DML/compact/rename before any data: nothing to do
        elif kind == "delete":
            store.delete_where("t", [("id", ">=", param)])
            model = [r for r in model if r[0] < param]
        elif kind == "mor_delete":
            # merge-on-read: same visible semantics as COW, via
            # position deletion vectors — fuzzes every DV interaction
            # (merge over DVs, COW-after-MoR retirement, compaction
            # materialization, vacuum of superseded sidecars)
            store.delete_where("t", [("id", ">=", param)], mode="mor")
            model = [r for r in model if r[0] < param]
        elif kind == "update":
            store.update_where(
                "t", [("id", "<=", param)], {vname: f"{vname} + 100"}
            )
            model = [
                (k, v + 100 if k <= param else v, s, p) for k, v, s, p in model
            ]
        elif kind == "rename":
            new = "v2" if vname == "v" else "v"
            store.rename_column("t", vname, new)
            vname = new  # values unchanged; only the logical name moves
        elif kind == "optimize":
            store.optimize("t", small_file_bytes=1 << 30, min_files=2)
        else:  # compact
            store.compact("t", sort_by=["id"])
        if not store.table_exists("t"):
            assert model == []
            continue
        got = sorted(
            (r["id"], r[vname])
            for r in store.read("t").select("id", vname).collect()
        )
        assert got == sorted((k, v) for k, v, *_ in model), (
            f"after {kind}(param={param}) rows={rows}"
        )
    # the model must also survive the full maintenance path
    if store.table_exists("t"):
        store.compact("t")
        store.vacuum("t")
        got = sorted(
            (r["id"], r[vname])
            for r in store.read("t").select("id", vname).collect()
        )
        assert got == sorted((k, v) for k, v, *_ in model)


@given(
    values=st.lists(
        st.text(min_size=0, max_size=24), min_size=1, max_size=40
    )
)
@settings(max_examples=8, deadline=None)
def test_hll_estimate_engine_parity_on_arbitrary_strings(spark, values):
    """The HLL sketch's cross-engine bit-exactness must hold for
    ADVERSARIAL inputs, not just the test tables: arbitrary unicode
    (emoji, combining marks, quotes, empty strings) hashes through
    Spark's md5 and DuckDB's md5 identically iff both use the UTF-8
    bytes — this pins that, plus the whole register/estimate chain."""
    import duckdb
    import pandas as pd

    from pyairbyte_spark.operators.sketches import (
        hll_distinct,
        hll_distinct_oracle_sql,
    )

    df = spark.createDataFrame([("g", v) for v in values], "g string, v string")
    got = sorted(
        tuple(r)
        for r in hll_distinct(
            df, group_cols=["g"], value="v", p=8, include_exact=True
        ).collect()
    )
    con = duckdb.connect()
    con.register("vals", pd.DataFrame({"g": "g", "v": values}))
    oracle = hll_distinct_oracle_sql(
        table_expr="vals",
        group_cols=["g"],
        value_sql="v",
        p=8,
        include_exact=True,
    )
    want = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert got == want


@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["append", "delete", "compact"]),
            st.integers(0, 6),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=6, deadline=None)
@pytest.mark.slow
def test_ndv_maintenance_matches_reanalyze(spark, tmp_path_factory, ops):
    """Any interleaving of appends (incremental register fold),
    deletes (forced re-analyze), and compaction (no-op for NDV) must
    leave approx_distinct() equal to a from-scratch ANALYZE at the
    same version — maintained stats can never drift from recomputed
    ones."""
    from pyspark.sql import functions as F

    from pyairbyte_spark import ndv
    from pyairbyte_spark.writers import CommitLogTableStore

    tmp = tmp_path_factory.mktemp("ndv-prop")
    store = CommitLogTableStore(spark, str(tmp), "m")

    def batch(seed):
        return (
            spark.range(seed * 40, seed * 40 + 60)
            .toDF("id")
            .withColumn("grp", (F.col("id") % 5).cast("string"))
            .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
            .withColumn("_airbyte_extracted_at", F.current_timestamp())
            .coalesce(1)
        )

    store.write_append(batch(0), "t")
    ndv.analyze_ndv(store, "t", ["id", "grp"], p=8)
    for kind, param in ops:
        if kind == "append":
            store.write_append(batch(param + 1), "t")
        elif kind == "delete":
            store.delete_where("t", [("id", ">=", param * 40)])
        else:
            store.compact("t")
        maintained = ndv.approx_distinct(spark, store, "t", p=8)
        fresh_doc = ndv.analyze_ndv(store, "t", ["id", "grp"], p=8)
        fresh = ndv.approx_distinct(spark, store, "t", p=8)
        assert maintained == fresh, (kind, param, maintained, fresh)
        assert fresh_doc["version"] == store.latest_version("t")
