"""Persisted MinHash-LSH near-dup index: build / atomic append /
zone-map-pruned probe (operators/dedup.py). The dedup-at-ingest
counterpart of the IVF/PQ vector indexes — O(batch) maintenance,
O(touched buckets) probes. No reference analog (the reference has no
dedup operators); public patterns: Lee et al. dedup + Delta zone maps.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.operators import dedup
from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    st = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    st.TXN_RESOLVE_GRACE_S = 0.2
    return st


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "pack my box with five dozen liquor jugs right now"),
    (3, "sphinx of black quartz judge my vow said the king"),
    (4, "a completely different sentence about spark engines here"),
]


def test_build_append_probe_roundtrip(spark, store):
    dedup.build_minhash_index(
        _docs(spark, CORPUS), store, "mh", id_col="doc_id", text_col="text"
    )
    # append a near-copy of doc 1 (one word changed) atomically
    r = dedup.append_to_minhash_index(
        _docs(
            spark,
            [(10, "the quick brown fox jumps over the lazy cat tonight")],
        ),
        store,
        "mh",
        txn=("app", 1),
    )
    assert r == {"appended": 1, "skipped": False}
    # probing the near-copy finds doc 1 (and not the unrelated docs)
    out = dedup.minhash_index_matches(
        store,
        "mh",
        _docs(spark, [(99, "the quick brown fox jumps over the lazy dog tonight")]),
        min_agree=6,
    ).collect()
    matched = {r["match_id"] for r in out}
    assert 1 in matched
    assert 4 not in matched
    # exact duplicate agrees on every signature position
    exact = next(r for r in out if r["match_id"] == 1)
    assert exact["n_agree"] == 12 and exact["n_bands"] == 4


def test_append_is_atomic_and_exactly_once(spark, store):
    dedup.build_minhash_index(
        _docs(spark, CORPUS), store, "mh", id_col="doc_id", text_col="text"
    )
    n_bands0 = store.read("mh_bands").count()
    n_sigs0 = store.read("mh_sigs").count()
    batch = _docs(spark, [(20, "zebra yak xylophone wombat vulture unicorn t")])
    dedup.append_to_minhash_index(batch, store, "mh", txn=("ing", 5))
    assert store.read("mh_bands").count() == n_bands0 + 4
    assert store.read("mh_sigs").count() == n_sigs0 + 1
    # replay skips the WHOLE group: neither table moves
    r = dedup.append_to_minhash_index(batch, store, "mh", txn=("ing", 5))
    assert r["skipped"]
    assert store.read("mh_bands").count() == n_bands0 + 4
    assert store.read("mh_sigs").count() == n_sigs0 + 1
    # both head commits share one committed txn group
    hb = store.history("mh_bands")[0]
    hs = store.history("mh_sigs")[0]
    assert hb["txn_verdict"] == hs["txn_verdict"] == "commit"
    assert hb["txn_group"] == hs["txn_group"]


def test_probe_scan_is_file_pruned(spark, store):
    """The probe's read_where must open only the files whose zone maps
    cover a probed band hash — the plan gate for 'O(touched buckets),
    not O(corpus)'."""
    big = _docs(
        spark,
        [
            (i, " ".join(f"w{i}x{j}" for j in range(12)))
            for i in range(1, 201)
        ],
    )
    dedup.build_minhash_index(
        big, store, "mh", id_col="doc_id", text_col="text", target_files=16
    )
    q = _docs(spark, [(999, " ".join(f"w7x{j}" for j in range(12)))])
    m = dedup._minhash_index_meta(store, "mh")
    qsig = dedup.minhash_signature(
        q, "text", "doc_id", num_hashes=m["num_hashes"], k=m["k"]
    )
    qb = dedup.lsh_bands(
        qsig, "doc_id", bands=m["bands"], rows=m["num_hashes"] // m["bands"]
    )
    hashes = sorted(r["band_hash"] for r in qb.select("band_hash").collect())
    plan = store.plan_scan("mh_bands", [("band_hash", "in", hashes)])
    assert plan["files_total"] >= 16
    assert plan["files_selected"] < plan["files_total"]
    # and the probe still finds the exact duplicate
    out = dedup.minhash_index_matches(store, "mh", q, min_agree=12).collect()
    assert {r["match_id"] for r in out} == {7}


def test_large_probe_degrades_to_relational_join(spark, store, monkeypatch):
    dedup.build_minhash_index(
        _docs(spark, CORPUS), store, "mh", id_col="doc_id", text_col="text"
    )
    monkeypatch.setattr(dedup, "MINHASH_PROBE_LITERAL_MAX", 0)
    out = dedup.minhash_index_matches(
        store,
        "mh",
        _docs(spark, [(99, "pack my box with five dozen liquor jugs right now")]),
        min_agree=12,
    ).collect()
    assert {r["match_id"] for r in out} == {2}


# -- ExactSubstr span removal (same module) -----------------------------------


def test_remove_duplicate_spans_semantics(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique one two"),
            (2, f"{shared} other tail words"),
            (3, "totally different text with no shared spans at all here"),
            (4, f"pre1 pre2 pre3 {shared}"),  # dup span mid-doc
            (5, "short doc"),  # < n tokens: no grams, fully kept
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_spans(docs, n=8).collect()
    }
    assert out[1]["cleaned_text"] == "unique one two"
    assert out[2]["cleaned_text"] == "other tail words"
    assert out[1]["n_removed"] == out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    assert out[4]["cleaned_text"] == "pre1 pre2 pre3"
    assert out[5] ["n_removed"] == 0 and out[5]["cleaned_text"] == "short doc"


def test_remove_duplicate_spans_in_doc_repeat_counts(spark):
    """POSITIONAL grams: a span repeated inside ONE doc is duplication
    (distinct-gram formulations miss this)."""
    seq = "a1 a2 a3 a4 a5 a6 a7 a8"
    docs = spark.createDataFrame(
        [(1, f"{seq} middle {seq}"), (2, "unrelated words entirely here")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_spans(docs, n=8).collect()
    }
    assert out[1]["cleaned_text"] == "middle"
    assert out[1]["n_removed"] == 16
    assert out[2]["n_removed"] == 0


def test_minhash_index_streaming_sink_exactly_once(spark, store, tmp_path):
    """Stream-maintained dedup index: two micro-batch epochs append
    atomically, a redelivered epoch is a no-op on BOTH tables, and
    probing the stream-maintained index equals a batch-built one."""
    from pyairbyte_spark.streaming.sink import MinHashIndexStreamingSink

    all_docs = _docs(
        spark,
        CORPUS
        + [
            (10, "the quick brown fox jumps over the lazy cat tonight"),
            (11, "entirely fresh words nobody reuses anywhere else today"),
        ],
    )
    dedup.build_minhash_index(
        _docs(spark, CORPUS), store, "mh", id_col="doc_id", text_col="text"
    )
    src = tmp_path / "docsrc"
    src.mkdir()
    all_docs.filter(F.col("doc_id") == 10).coalesce(1).write.parquet(
        str(src / "b0")
    )
    all_docs.filter(F.col("doc_id") == 11).coalesce(1).write.parquet(
        str(src / "b1")
    )
    sink = MinHashIndexStreamingSink(store, "mh", "docpipe")
    stream = spark.readStream.schema(all_docs.schema).parquet(str(src) + "/*")
    q = sink.attach(
        stream, checkpoint_dir=str(tmp_path / "mhckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    assert store.read("mh_sigs").count() == 6
    assert store.read("mh_bands").count() == 24
    # redeliver the last epoch verbatim: no-op on BOTH tables
    last = store.txn_version("mh_bands", "docpipe")
    sink(all_docs.filter(F.col("doc_id") == 11), last)
    assert sink.skipped_epochs == 1
    assert store.read("mh_sigs").count() == 6
    assert store.read("mh_bands").count() == 24
    # stream-maintained index probes identically to a batch build
    store2 = CommitLogTableStore(
        spark, str(tmp_path / "wh2"), "main"
    )
    dedup.build_minhash_index(
        all_docs, store2, "mh", id_col="doc_id", text_col="text"
    )
    q99 = _docs(
        spark, [(99, "the quick brown fox jumps over the lazy dog tonight")]
    )
    got = sorted(
        map(tuple, dedup.minhash_index_matches(store, "mh", q99).collect())
    )
    ref = sorted(
        map(tuple, dedup.minhash_index_matches(store2, "mh", q99).collect())
    )
    assert got == ref and len(got) >= 2  # docs 1 and 10 both match


def test_remove_duplicate_spans_pathological_doc_linear(spark):
    """One token repeated 50k times: every position is a duplicated
    gram start. The interval fold collapses them to ONE merged
    interval, so marking is linear — the per-token exists() scan this
    replaced was O(50k²) on exactly this shape. Assert full removal
    and that a mixed corpus around it stays exact."""
    import time

    from pyairbyte_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, " ".join(["spam"] * 50_000)),
            (2, "a unique sentence with no duplicated grams at all"),
        ],
        ["doc_id", "text"],
    )
    t0 = time.monotonic()
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in dedup.remove_duplicate_spans(docs, n=8).collect()
    }
    elapsed = time.monotonic() - t0
    assert got[1] == (50_000, 50_000, "")
    assert got[2][1] == 0 and got[2][2].startswith("a unique")
    # generous wall bound: quadratic marking took minutes here
    assert elapsed < 60, f"pathological doc took {elapsed:.1f}s"


def _many_docs(spark, lo, hi):
    """Fully-random token streams: no shared shingles across docs, so
    every band hash is effectively unique (no accidental hot bands)."""
    words = [F.md5((F.col("id") * p + 1).cast("string")) for p in (3, 7, 11, 13, 17, 19, 23, 29)]
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
    )


def test_coverage_decays_on_append_and_refresh_restores_pruning(spark, store):
    """VERDICT r10 #2 'done' gate: ingest-time appends silently decay
    probe pruning; minhash_index_coverage is the watermark and
    refresh_minhash_index reclusters ONLY the appended tail — probe
    files-opened must return to the compacted level."""
    dedup.build_minhash_index(
        _many_docs(spark, 0, 400),
        store,
        "mh",
        id_col="doc_id",
        text_col="text",
        target_files=8,
    )
    cov0 = dedup.minhash_index_coverage(store, "mh")
    assert cov0["coverage"] == 1.0 and cov0["files_unclustered"] == 0
    # clear write-time clustering to exercise the legacy decay/refresh
    # lifecycle (builds now set it, keeping coverage at 1.0 on ingest)
    store.set_cluster_by("mh_bands", None)

    def probe_files():
        q = _many_docs(spark, 0, 1)
        m = dedup._minhash_index_meta(store, "mh")
        sig = dedup.minhash_signature(
            q, "text", "doc_id", num_hashes=m["num_hashes"], k=m["k"]
        )
        qb = dedup.lsh_bands(
            sig, "doc_id", bands=m["bands"],
            rows=m["num_hashes"] // m["bands"],
        )
        hashes = [r["band_hash"] for r in qb.select("band_hash").collect()]
        plan = store.plan_scan("mh_bands", [("band_hash", "in", hashes)])
        return plan["files_selected"], plan["files_total"]

    sel0, tot0 = probe_files()
    assert sel0 < tot0  # the clustered index prunes
    # two ingest-time appends: coverage decays, probes widen
    dedup.append_to_minhash_index(_many_docs(spark, 400, 500), store, "mh")
    dedup.append_to_minhash_index(_many_docs(spark, 500, 600), store, "mh")
    cov1 = dedup.minhash_index_coverage(store, "mh")
    assert cov1["files_unclustered"] > 0 and cov1["coverage"] < 1.0
    sel1, tot1 = probe_files()
    assert tot1 > tot0
    assert sel1 - sel0 == cov1["files_unclustered"]  # tail is unpruned
    # refresh reclusters ONLY the tail: coverage back to 1.0, probe
    # files-opened back to (near) the compacted level
    r = dedup.refresh_minhash_index(store, "mh", target_files=1)
    assert r["refreshed"] and r["coverage"] == 1.0
    sel2, _ = probe_files()
    assert sel2 <= sel0 + 1  # tail collapsed to its own sorted range
    # data-invisible: CDF emits nothing for the refresh commit
    # and probes return identical matches
    q = _many_docs(spark, 0, 3)
    out = dedup.minhash_index_matches(store, "mh", q).count()
    assert out == 0  # distinct docs: no near-dups, exact either way
    # idempotent: nothing left to recluster
    assert dedup.refresh_minhash_index(store, "mh")["refreshed"] is False


def test_minhash_index_health_trips_on_boilerplate(spark, store):
    """Boilerplate ingest (one template repeated) collapses docs into
    one band bucket: health must flag the hot band; a refresh fixes
    staleness but NOT skew (it is a data property)."""
    dedup.build_minhash_index(
        _many_docs(spark, 0, 200),
        store,
        "mh",
        id_col="doc_id",
        text_col="text",
        target_files=4,
    )
    h0 = dedup.minhash_index_health(store, "mh")
    assert h0["healthy"] and h0["rows"] == 200 * 4
    # boilerplate: 300 docs with IDENTICAL text -> one signature,
    # every band bucket shared by all 300
    boiler = spark.range(1000, 1300).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "unsubscribe from this newsletter by clicking the link below"
        ).alias("text"),
    )
    dedup.append_to_minhash_index(boiler, store, "mh")
    h1 = dedup.minhash_index_health(store, "mh")
    assert not h1["healthy"]
    assert any("hot band" in i for i in h1["issues"])
    assert h1["max_bucket_rows"] >= 300
    # staleness flags too at default threshold? files are few; check
    # coverage reported and refresh clears only the staleness signal
    dedup.refresh_minhash_index(store, "mh")
    h2 = dedup.minhash_index_health(store, "mh")
    assert h2["coverage"] == 1.0
    assert any("hot band" in i for i in h2["issues"])  # skew remains


def test_streaming_sink_auto_refresh_keeps_coverage(spark, store, tmp_path):
    """refresh_coverage_min makes the streaming sink self-maintaining.
    With write-time clustering (builds set it) every epoch lands
    already clustered — the self-maintenance is a NO-OP; clearing the
    property exercises the legacy decay path where each epoch dips
    below the floor and the sink reclusters the tail (O(tail))."""
    from pyairbyte_spark.streaming.sink import MinHashIndexStreamingSink

    dedup.build_minhash_index(
        _many_docs(spark, 0, 120), store, "mh", target_files=2
    )
    sink = MinHashIndexStreamingSink(
        store, "mh", "pipe", refresh_coverage_min=0.99
    )
    sink(_many_docs(spark, 190, 200), 0)
    assert sink.appended_epochs == 1
    assert sink.refreshes == 0  # clustered append: nothing to repair
    assert dedup.minhash_index_coverage(store, "mh")["coverage"] == 1.0
    store.set_cluster_by("mh_bands", None)  # legacy decay lifecycle
    for epoch in range(1, 4):
        sink(_many_docs(spark, 200 + epoch * 10, 210 + epoch * 10), epoch)
    assert sink.appended_epochs == 4
    assert sink.refreshes == 3  # each epoch dipped below the floor
    cov = dedup.minhash_index_coverage(store, "mh")
    assert cov["coverage"] == 1.0
    # replayed epoch: no append, no refresh
    sink(_many_docs(spark, 220, 230), 3)
    assert sink.skipped_epochs == 1 and sink.refreshes == 3
    # index still exact: every streamed doc is probe-hittable
    hits = dedup.minhash_index_matches(
        store, "mh", _many_docs(spark, 215, 216).withColumn(
            "doc_id", F.col("doc_id") + 9000
        )
    ).collect()
    assert any(r["match_id"] == 215 and r["n_agree"] == 12 for r in hits)


def test_jaccard_similarity_join_exact_vs_bruteforce(spark):
    """Prefix-filter ssjoin is EXACT: identical pair set to the O(n²)
    brute force, including a pair sitting exactly AT the threshold
    (integer cross-multiplied comparison — no float boundary loss)."""
    import itertools
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(40):
        n = rng.randint(4, 12)
        rows.append((i, " ".join(rng.sample(vocab, n))))
    # exact-threshold pair: two 9-token docs sharing 8 -> J = 8/10 = 0.8
    base = vocab[:8]
    rows.append((100, " ".join(base + ["only100"])))
    rows.append((101, " ".join(base + ["only101"])))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["n_union"])
        for r in dedup.jaccard_similarity_join(docs, threshold=0.8).collect()
    }
    sets = {i: frozenset(t.split()) for i, t in rows}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter * 5 >= union * 4:
            want[(a, b)] = (inter, union)
    assert got == want
    assert (100, 101) in got and got[(100, 101)] == (8, 10)
    # lower threshold: still exactly the brute-force set
    got2 = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_similarity_join(docs, threshold=0.5).collect()
    }
    want2 = {
        (a, b)
        for a, b in itertools.combinations(sorted(sets), 2)
        if 2 * len(sets[a] & sets[b]) >= len(sets[a] | sets[b])
    }
    assert got2 == want2 and got2 >= set(got)


# -- CDF-driven transactional maintenance --------------------------------------


def test_minhash_sync_tracks_table_dml(spark, store):
    from pyairbyte_spark.operators.dedup import (
        attach_minhash_index,
        minhash_index_matches,
        sync_minhash_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "pack my box with five dozen liquor jugs right now"),
            (3, "completely unrelated text about databases and queries"),
        ],
        ["doc_id", "text"],
    ).withColumn(
        "_airbyte_raw_id", F.concat(F.lit("r"), F.col("doc_id"))
    ).withColumn(
        "_airbyte_extracted_at", F.lit("2024-01-01").cast("timestamp")
    )
    store.write_append(docs, "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    q = spark.createDataFrame(
        [(-1, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    )
    assert {
        r["match_id"]
        for r in minhash_index_matches(store, "mh", q).collect()
    } == {1}
    # DELETE doc 1 from the corpus; after sync it must stop matching
    store.merge_into(
        "docs",
        spark.createDataFrame([(1,)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    r = sync_minhash_index(store, "mh")
    assert r["docs_changed"] == 1
    assert minhash_index_matches(store, "mh", q).count() == 0
    # UPDATE doc 2 to become the near-dup; INSERT doc 4 identical
    store.merge_into(
        "docs",
        spark.createDataFrame(
            [
                (2, "the quick brown fox jumps over the lazy dog tonight"),
                (4, "the quick brown fox jumps over the lazy dog today"),
            ],
            "doc_id long, text string",
        ),
        ["doc_id"],
        when_matched_update={"text": "s.text"},
    )
    sync_minhash_index(store, "mh")
    hits = {
        r["match_id"]: r["n_agree"]
        for r in minhash_index_matches(store, "mh", q).collect()
    }
    assert 2 in hits and hits[2] == 12  # updated sig wins (exact dup)
    assert 4 in hits  # fresh insert indexed
    # no-op when caught up
    assert sync_minhash_index(store, "mh")["docs_changed"] == 0


def test_minhash_sync_atomic_and_raced(spark, store):
    import threading

    from pyairbyte_spark.operators.dedup import (
        attach_minhash_index,
        sync_minhash_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    ).withColumn(
        "_airbyte_raw_id", F.concat(F.lit("r"), F.col("doc_id"))
    ).withColumn(
        "_airbyte_extracted_at", F.lit("2024-01-01").cast("timestamp")
    )
    store.write_append(docs, "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    vers = {
        t: store.latest_version(f"mh_{t}")
        for t in ("bands", "sigs", "meta")
    }
    store.merge_into(
        "docs",
        spark.createDataFrame(
            [(5, "eta theta iota kappa lambda mu")],
            "doc_id long, text string",
        ),
        ["doc_id"],
        when_matched_update={"text": "s.text"},
    )
    results = []
    ts = [
        threading.Thread(
            target=lambda: results.append(sync_minhash_index(store, "mh"))
        )
        for _ in range(2)
    ]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert len([r for r in results if r["docs_changed"]]) == 1, results
    for t in ("bands", "sigs", "meta"):
        assert store.latest_version(f"mh_{t}") > vers[t], t


def test_minhash_fold_clears_tombstone_debt(spark, store):
    from pyairbyte_spark.operators.dedup import (
        attach_minhash_index,
        fold_minhash_index,
        minhash_index_health,
        minhash_index_matches,
        sync_minhash_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "pack my box with five dozen liquor jugs right now"),
        ],
        ["doc_id", "text"],
    ).withColumn(
        "_airbyte_raw_id", F.concat(F.lit("r"), F.col("doc_id"))
    ).withColumn(
        "_airbyte_extracted_at", F.lit("2024-01-01").cast("timestamp")
    )
    store.write_append(docs, "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    store.merge_into(
        "docs",
        spark.createDataFrame([(2,)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    sync_minhash_index(store, "mh")
    h0 = minhash_index_health(store, "mh", tombstone_max=0.05)
    assert h0["tombstone_fraction"] > 0.05
    r = fold_minhash_index(store, "mh")
    assert r["folded"] is True
    h1 = minhash_index_health(store, "mh", tombstone_max=0.05)
    assert h1["tombstone_fraction"] == 0.0
    # deleted doc's signatures pruned with its bands
    assert store.read("mh_sigs").filter(F.col("id") == 2).count() == 0
    q = spark.createDataFrame(
        [(-1, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    )
    assert {
        r["match_id"]
        for r in minhash_index_matches(store, "mh", q).collect()
    } == {1}


# -- round-12: O(diff) sync, netted fallback, multi-table fold guard ------------


def test_minhash_sync_never_scans_bands(spark, store, monkeypatch):
    """Plan gate: sync derives retraction tombstones from the SOURCE's
    old snapshot — evaluating any bands-table row during the sync is
    poisoned and would crash (the old derivation scanned the whole
    band-clustered, id-unprunable table per sync)."""
    from pyairbyte_spark.operators.dedup import (
        attach_minhash_index,
        minhash_index_matches,
        sync_minhash_index,
    )

    docs = _docs(spark, CORPUS)
    store.write_append(docs, "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    store.merge_into(
        "docs",
        spark.createDataFrame([(1,)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    orig_read, orig_rw = store.read, store.read_where

    def poison(df):
        return df.filter(F.assert_true(F.lit(False)).isNull())

    monkeypatch.setattr(
        store,
        "read",
        lambda t, **k: (
            poison(orig_read(t, **k)) if t == "mh_bands" else orig_read(t, **k)
        ),
    )
    monkeypatch.setattr(
        store,
        "read_where",
        lambda t, *a, **k: (
            poison(orig_rw(t, *a, **k)) if t == "mh_bands" else orig_rw(t, *a, **k)
        ),
    )
    r = sync_minhash_index(store, "mh")
    assert r["docs_changed"] == 1
    monkeypatch.setattr(store, "read", orig_read)
    monkeypatch.setattr(store, "read_where", orig_rw)
    q = _docs(spark, [(-1, CORPUS[0][1])])
    assert minhash_index_matches(store, "mh", q).count() == 0


def test_minhash_sync_never_rereads_cursor_snapshot(
    spark, tmp_path, monkeypatch
):
    """r13: retractions ride the diff's delete/update_preimage rows —
    the sync never re-reads the cursor snapshot (poisoned here), and
    the deleted doc stops matching probes. (Netting under out-of-band
    duplicate appends — the index-side derivation — is gated in
    test_index_oob.py via the recorded ``oob_appends`` flag.)"""
    from pyairbyte_spark.operators.dedup import (
        attach_minhash_index,
        minhash_index_matches,
        sync_minhash_index,
    )

    store = CommitLogTableStore(
        spark, str(tmp_path / "whb"), "main", merge_buckets=8
    )
    docs = _docs(spark, CORPUS)
    store.write_append(docs, "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    store.merge_into(
        "docs",
        spark.createDataFrame([(1,)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    monkeypatch.setattr(
        store,
        "read_version",
        lambda tbl, v, **kw: (_ for _ in ()).throw(
            AssertionError(f"sync re-read snapshot {tbl}@{v}")
        ),
    )
    r = sync_minhash_index(store, "mh")
    assert r["docs_changed"] == 1
    monkeypatch.undo()
    q = _docs(spark, [(-1, CORPUS[0][1])])
    assert minhash_index_matches(store, "mh", q).count() == 0

def test_guarded_replace_inspects_every_table_window(spark, store):
    """A foreign commit inside ANY written table's slot window aborts
    the guarded replace — guarding only one table let a two-table sync
    straddle the fold (bands above, sigs below) and silently lose its
    signature rows."""
    from pyairbyte_spark.operators.dedup import build_minhash_index
    from pyairbyte_spark.operators.search import _guarded_index_replace

    docs = _docs(spark, CORPUS)
    build_minhash_index(docs, store, "mh")
    v_b = store.latest_version("mh_bands")
    v_s = store.latest_version("mh_sigs")
    # interleaver ONLY in the sigs window — the bands window stays
    # clean, so the old single-guard-table check passed and clobbered
    sigs99 = store.read("mh_sigs").filter(F.col("id") == 1).withColumn(
        "id", F.lit(99).cast("long")
    ).localCheckpoint()
    store.write_append(sigs99, "mh_sigs")
    ok = _guarded_index_replace(
        store,
        [
            (store.read("mh_bands"), "mh_bands", v_b),
            (store.read("mh_sigs").filter(F.col("id") != 99), "mh_sigs", v_s),
        ],
    )
    assert ok is False
    # the interleaver's rows survive
    assert store.read("mh_sigs").filter(F.col("id") == 99).count() == 1
    # with fresh base versions (no interleaver inside any window) the
    # replace commits
    ok2 = _guarded_index_replace(
        store,
        [
            (
                store.read("mh_bands").localCheckpoint(),
                "mh_bands",
                store.latest_version("mh_bands"),
            ),
            (
                store.read("mh_sigs").localCheckpoint(),
                "mh_sigs",
                store.latest_version("mh_sigs"),
            ),
        ],
    )
    assert ok2 is True


def test_build_sets_write_time_clustering(spark, store):
    """Round-12 gate: the build sets cluster_by on the bands table, so
    appends stay clustered and coverage holds at 1.0 through ingest."""
    dedup.build_minhash_index(
        _many_docs(spark, 0, 200), store, "mh", target_files=4
    )
    dedup.append_to_minhash_index(_many_docs(spark, 200, 260), store, "mh")
    cov = dedup.minhash_index_coverage(store, "mh")
    assert cov["coverage"] == 1.0 and cov["files_unclustered"] == 0
    assert dedup.refresh_minhash_index(store, "mh")["refreshed"] is False


def test_fold_retries_catch_up_incrementally(spark, store, monkeypatch):
    """A fold losing its two-table guarded commit catches up with only
    the rows appended since (both tables), never recomputing the
    O(index) nets — and the landed fold keeps every late append."""
    import pyairbyte_spark.operators.search as search_mod
    from pyairbyte_spark.operators.dedup import (
        append_to_minhash_index,
        attach_minhash_index,
        fold_minhash_index,
        minhash_index_matches,
        sync_minhash_index,
    )

    docs = _docs(spark, CORPUS)
    store.write_append(docs, "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    store.merge_into(
        "docs",
        spark.createDataFrame([(2,)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    sync_minhash_index(store, "mh")  # tombstone debt
    real_guard = search_mod._guarded_index_replace
    state = {"n": 0}
    late = _docs(
        spark, [(50, "totally novel words appearing nowhere else at all")]
    )

    def flaky(store_, writes):
        state["n"] += 1
        if state["n"] == 1:
            append_to_minhash_index(late, store_, "mh", allow_oob=True)
        return real_guard(store_, writes)

    monkeypatch.setattr(search_mod, "_guarded_index_replace", flaky)
    r = fold_minhash_index(store, "mh")
    assert r["folded"] is True and state["n"] == 2
    # zero retraction rows; the late append survived the fold in BOTH
    # tables and is probe-hittable with full signature agreement
    assert store.read("mh_bands").filter(F.col("sign") < 0).count() == 0
    assert store.read("mh_sigs").filter(F.col("id") == 50).count() == 1
    q = _docs(spark, [(-1, "totally novel words appearing nowhere else at all")])
    out = minhash_index_matches(store, "mh", q, min_agree=12).collect()
    assert {x["match_id"] for x in out} == {50}
    # the synced-out doc stays gone
    q2 = _docs(spark, [(-2, CORPUS[1][1])])
    assert minhash_index_matches(store, "mh", q2).count() == 0


def test_probe_skips_sign_fold_when_no_tombstones(spark, store):
    """Round-12 A/B closure: tombstone-free indexes (fresh builds,
    post-fold) prove min(sign) >= 0 from manifest zone maps and skip
    the per-probe sign fold entirely; a delete sync flips the flag, a
    fold clears it — probe results identical in every regime."""
    from pyairbyte_spark.operators.dedup import (
        _bands_have_tombstones,
        attach_minhash_index,
        fold_minhash_index,
        minhash_index_matches,
        sync_minhash_index,
    )

    docs = _docs(spark, CORPUS)
    store.write_append(docs, "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    assert _bands_have_tombstones(store, "mh") is False
    q = _docs(spark, [(-1, CORPUS[0][1]), (-2, CORPUS[1][1])])
    before = sorted(
        map(tuple, minhash_index_matches(store, "mh", q).collect())
    )
    assert {m[1] for m in before} == {1, 2}
    # delete doc 2: the sync appends negative rows -> flag trips
    store.merge_into(
        "docs",
        spark.createDataFrame([(2,)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    sync_minhash_index(store, "mh")
    assert _bands_have_tombstones(store, "mh") is True
    mid = minhash_index_matches(store, "mh", q).collect()
    assert {m["match_id"] for m in mid} == {1}
    # fold rewrites to all-positive: flag clears, results unchanged
    assert fold_minhash_index(store, "mh")["folded"] is True
    assert _bands_have_tombstones(store, "mh") is False
    after = minhash_index_matches(store, "mh", q).collect()
    assert {m["match_id"] for m in after} == {1}


def test_minhash_index_follows_branch_and_survives_publish(spark, store):
    from pyairbyte_spark.operators.dedup import (
        attach_minhash_index,
        minhash_index_matches,
        sync_minhash_index,
    )

    docs = _docs(spark, CORPUS)
    store.write_append(docs, "docs", ["doc_id"])
    store.create_branch("docs", "audit")
    attach_minhash_index(store, "docs", "mh", ref="audit")
    bv = store.branch("audit")
    bv.merge_into(
        "docs",
        spark.createDataFrame([(1,)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    r = sync_minhash_index(store, "mh")
    assert r["docs_changed"] == 1
    # doc 1 deleted ON THE BRANCH: the index stops matching it even
    # though main still holds it
    q = _docs(spark, [(-1, CORPUS[0][1])])
    assert minhash_index_matches(store, "mh", q).count() == 0
    store.publish_branch("docs", "audit")
    r2 = sync_minhash_index(store, "mh")
    assert r2.get("docs_changed") == 0
    m = store.read("mh_meta").collect()[0].asDict()
    assert m["source_ref"] is None
    # main DML keeps flowing post-publish
    store.merge_into(
        "docs",
        spark.createDataFrame([(2,)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    sync_minhash_index(store, "mh")
    q2 = _docs(spark, [(-2, CORPUS[1][1])])
    assert minhash_index_matches(store, "mh", q2).count() == 0
    q3 = _docs(spark, [(-3, CORPUS[2][1])])
    assert {x["match_id"] for x in minhash_index_matches(store, "mh", q3).collect()} == {3}


def test_tombstone_proof_requires_complete_sign_stats(spark, store, tmp_path):
    """Advisor r12: min(sign) >= 0 aggregated over only the files that
    CARRY a sign stat proves nothing about a stat-less legacy file —
    the metadata fast path must fall back to the fold unless every
    live file is statted."""
    import json
    import os

    from pyairbyte_spark.operators.dedup import _bands_have_tombstones

    dedup.build_minhash_index(
        _docs(spark, CORPUS), store, "mh", target_files=2
    )
    assert _bands_have_tombstones(store, "mh") is False  # clean + complete
    # doctor the manifest: strip the sign stat from one live file
    # (simulating a pre-stats-layer writer's file)
    # the head may be a metadata-only delta (set_cluster_by): walk down
    # to the commit that carries the entry list
    v = store.latest_version("mh_bands")
    while True:
        p = os.path.join(store._commits_dir("mh_bands"), f"{v:020d}.json")
        man = json.loads(open(p).read())
        if "entries" in man:
            break
        v -= 1
    stripped = False
    for e in man["entries"]:
        for f in e.get("files") or []:
            if (f.get("stats") or {}).pop("sign", None) is not None:
                stripped = True
                break
        if stripped:
            break
    assert stripped
    open(p, "w").write(json.dumps(man))
    fresh = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    st = fresh.table_stats("mh_bands")
    sign = st["columns"].get("sign")
    # the aggregate still proves min >= 0 over STATTED files...
    assert sign is None or sign.get("min", 0) >= 0
    # ...but the completeness check keeps the probe conservative
    assert _bands_have_tombstones(fresh, "mh") is True
