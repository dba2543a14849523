"""S3FileIO: the commit-log store's metadata protocol against a REAL
S3 API implementation (moto in-process), not just the semantics double.

FakeObjectStoreFileIO proved the protocol never needs rename/link;
this suite proves the actual wire-level behaviors the deployment
depends on: conditional PUT via If-None-Match (412 on conflict),
paginated LIST with common prefixes, ranged GETs for parquet footer
harvest, idempotent DELETE — and the full commit protocol (delta
manifests, checkpoint sidecars, latest pointer, vacuum) running
end-to-end over s3:// paths.

Spark DATA reads/writes over s3a — including the distributed manifest
scan's s3a sidecar branch, the committer's rename path, and the race
suite on the S3 backend — run end-to-end in
``tests/test_s3_data_plane.py`` against a moto SERVER; this module
stays focused on the driver-side metadata paths FileIO owns.
"""

from __future__ import annotations

import json
import threading

import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from pyairbyte_spark import manifest as mf
from pyairbyte_spark.fileio import S3FileIO
from pyairbyte_spark.writers import CommitLogTableStore

BUCKET = "test-bucket"
ROOT = f"s3://{BUCKET}/warehouse"


@pytest.fixture()
def s3io():
    with moto.mock_aws():
        c = boto3.client("s3", region_name="us-east-1")
        c.create_bucket(Bucket=BUCKET)
        yield S3FileIO(c)


def test_roundtrip_and_missing(s3io):
    p = f"{ROOT}/a/b.json"
    s3io.write_text(p, "hello")
    assert s3io.read_text(p) == "hello"
    s3io.write_bytes(p, b"\x00\x01")
    assert s3io.read_bytes(p) == b"\x00\x01"
    with pytest.raises(FileNotFoundError):
        s3io.read_text(f"{ROOT}/missing.json")
    with pytest.raises(FileNotFoundError):
        s3io.file_size(f"{ROOT}/missing.json")


def test_put_if_absent_conditional(s3io):
    p = f"{ROOT}/c/00000001.json"
    assert s3io.put_if_absent(p, "first")
    assert not s3io.put_if_absent(p, "second")
    assert s3io.read_text(p) == "first"


def test_put_if_absent_threaded_race():
    """Conditional-PUT race against a moto *server*, not the
    in-process mock: mock_aws shares one non-thread-safe backend, so
    8 concurrent PUTs can all observe "absent" and all win — a fake
    artifact, not a production bug (S3 applies If-None-Match
    server-side-atomically). The server serializes backend mutation
    per HTTP request, which is the consistency model the real service
    gives us."""
    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0, verbose=False)
    srv.start()
    try:
        port = srv._server.socket.getsockname()[1]
        endpoint = f"http://127.0.0.1:{port}"

        def client():
            return boto3.client(
                "s3",
                endpoint_url=endpoint,
                aws_access_key_id="testing",
                aws_secret_access_key="testing",
                region_name="us-east-1",
            )

        client().create_bucket(Bucket=BUCKET)
        p = f"{ROOT}/c/race.json"
        wins = []
        wins_lock = threading.Lock()

        def attempt(i):
            # one client per thread: botocore clients are not
            # guaranteed thread-safe for concurrent calls
            if S3FileIO(client()).put_if_absent(p, f"writer-{i}"):
                with wins_lock:
                    wins.append(i)

        threads = [
            threading.Thread(target=attempt, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wins) == 1
        assert S3FileIO(client()).read_text(p) == f"writer-{wins[0]}"
    finally:
        srv.stop()


def test_listing_and_dirs(s3io):
    s3io.write_text(f"{ROOT}/t/_commits/00000001.json", "{}")
    s3io.write_text(f"{ROOT}/t/_commits/00000002.json", "{}")
    s3io.write_text(f"{ROOT}/t/d-abc/part-0.parquet", "pq")
    assert s3io.list_names(f"{ROOT}/t") == ["_commits", "d-abc"]
    assert s3io.list_names(f"{ROOT}/t/_commits") == [
        "00000001.json", "00000002.json",
    ]
    assert s3io.list_files(f"{ROOT}/t/d-abc") == [("part-0.parquet", 2)]
    assert s3io.is_dir(f"{ROOT}/t") and s3io.is_dir(f"{ROOT}/t/_commits")
    assert not s3io.is_dir(f"{ROOT}/nope")
    assert s3io.exists(f"{ROOT}/t/d-abc/part-0.parquet")
    assert s3io.exists(f"{ROOT}/t")  # dir-exists via prefix
    assert not s3io.exists(f"{ROOT}/t/zzz")
    assert s3io.list_names(f"{ROOT}/nope") == []


def test_delete_semantics(s3io):
    s3io.write_text(f"{ROOT}/t/x.json", "1")
    s3io.write_text(f"{ROOT}/t/sub/y.json", "2")
    s3io.delete_file(f"{ROOT}/t/x.json")
    s3io.delete_file(f"{ROOT}/t/x.json")  # idempotent
    assert not s3io.exists(f"{ROOT}/t/x.json")
    s3io.delete_dir(f"{ROOT}/t")
    assert not s3io.is_dir(f"{ROOT}/t")


def test_rename_refused(s3io):
    with pytest.raises(NotImplementedError):
        s3io.rename(f"{ROOT}/a", f"{ROOT}/b")


def test_parquet_footer_harvest_over_ranged_gets(s3io):
    """Stats harvest (zone maps) reads ONLY the footer via ranged
    GETs — upload a real parquet file and harvest through the seam."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyairbyte_spark.filestats import harvest_file_stats

    buf = io.BytesIO()
    pq.write_table(
        pa.table({"id": [1, 5, 9], "name": ["a", "m", "z"]}), buf
    )
    p = f"{ROOT}/t/d-x/part-0.parquet"
    s3io.write_bytes(p, buf.getvalue())
    with s3io.open_input(p) as f:
        stats = harvest_file_stats(f)
    assert stats["rows"] == 3
    assert stats["stats"]["id"]["min"] == 1
    assert stats["stats"]["id"]["max"] == 9
    assert stats["stats"]["name"]["min"] == "a"


def _entry(v):
    return {
        "path": f"d-{v:08d}",
        "buckets": None,
        "files": [{
            "path": f"part-{v}.parquet", "bucket": None, "bytes": 100,
            "rows": 10, "sv": 2,
            "stats": {"id": {"min": v * 10, "max": v * 10 + 9, "nulls": 0}},
        }],
    }


def test_full_commit_protocol_over_s3(s3io, monkeypatch):
    """The store's whole metadata lifecycle on s3:// paths: delta
    commits, forced-full checkpoints spilling parquet sidecars,
    pointer-based latest discovery, chain resolution from a cold
    reader, zone-map scan planning, and vacuum — all through the S3
    API, no local filesystem anywhere in the metadata path."""
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 2)
    monkeypatch.setattr(mf, "CHECKPOINT_INTERVAL", 3)
    store = CommitLogTableStore(None, ROOT, "main", fileio=s3io)
    entries = []
    for v in range(1, 8):
        entries = entries + [_entry(v)]
        store._commit(
            "t", {"op": "append", "merge_buckets": None, "entries": entries}, v
        )
    # pointer-based discovery, no listing
    assert store._discover_latest("t") == 7
    ptr = json.loads(
        s3io.read_text(f"{ROOT}/main/t/_commits/{store._LATEST_PTR}")
    )
    assert ptr == {"version": 7}
    # cold reader resolves the delta chain through the s3 sidecars
    fresh = CommitLogTableStore(None, ROOT, "main", fileio=s3io)
    man = fresh._read_manifest("t", 7)
    assert len(man["entries"]) == 7
    raw6 = fresh._read_commit_json("t", 6)  # v6 = forced full at interval 3
    assert raw6.get("entries_ref", "").endswith(".checkpoint.parquet")
    # zone-map planning over s3-held manifests
    plan = fresh.plan_scan("t", [("id", "<", 15)])
    assert plan["files_selected"] == 1 and plan["files_total"] == 7
    # vacuum: reclaims old commits, keeps everything resolvable
    removed = fresh.vacuum("t", keep_commits=2)
    assert removed  # something was reclaimed
    fresh2 = CommitLogTableStore(None, ROOT, "main", fileio=s3io)
    assert len(fresh2._read_manifest("t", 7)["entries"]) == 7
    assert fresh2._discover_latest("t") == 7
    with pytest.raises(FileNotFoundError):
        fresh2._read_manifest("t", 3)  # vacuumed


def test_store_commit_race_on_s3(s3io):
    """Two writers race one version through the real conditional PUT:
    exactly one wins, the loser sees ConcurrentCommitError."""
    from pyairbyte_spark.writers import ConcurrentCommitError

    store = CommitLogTableStore(None, ROOT, "main", fileio=s3io)
    store._commit("t", {"op": "append", "entries": [_entry(1)]}, 1)
    with pytest.raises(ConcurrentCommitError):
        store._commit("t", {"op": "append", "entries": [_entry(2)]}, 1)
    assert store._read_manifest("t", 1)["entries"][0]["path"] == "d-00000001"
